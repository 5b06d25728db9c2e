"""Verify drive: phase2_train_net.py end-to-end over a tiny synthetic pickle
pool, exercising the device-data-cache path (need_map gating + budget knob)
on the real chip. Run from the repo root: python scripts/_verify_phase2_cache.py
"""
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mmfn_tpu.data.synthetic import synthetic_samples

root = "/tmp/verify_p2/mmfn"
os.makedirs(root, exist_ok=True)
for split, n, seed in (("train", 32, 0), ("eval", 8, 1)):
    out = os.path.join(os.path.dirname(root), f"pro_{split}_fmmfn")
    os.makedirs(out, exist_ok=True)
    for i, s in enumerate(synthetic_samples(n, max_lanes=8, seed=seed)):
        with open(os.path.join(out, f"{i}.pkl"), "wb") as f:
            pickle.dump(s, f)

for entry, extra in (("mmfn_vec", []), ("aim", [])):
    cmd = [sys.executable, "-u", os.path.join(REPO, "run_steps/phase2_train_net.py"),
           "--config", os.path.join(REPO, "run_steps/config/train.yaml"),
           f"data_folder={root}", "train_towns=[X]", "val_towns=[Y]",
           f"train_agent.entry_point={entry}",
           f"logdir=/tmp/verify_p2/log/{entry}", "batch_size=8", "epochs=2",
           "val_every=1", "max_lanes=8", "compute_dtype=bfloat16", *extra]
    print("::", entry, flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    assert r.returncode == 0, (entry, r.returncode)
print("VERIFY OK")
