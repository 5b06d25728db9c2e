"""Capture + analyze a REAL device trace of the bf16 train step (VERDICT r3 #5).

Round 3's memory-bound claim rested on XLA cost_analysis() bytes ("upper
bound" caveat in docs/PERFORMANCE.md). This script retires that caveat with a
jax.profiler device trace: it runs the engine's mixed-precision train step on
the real TPU under start_trace/stop_trace, then parses the resulting xplane
with jax.profiler.ProfileData, aggregating the per-op device timeline
("XLA Ops" line of the /device:TPU:0 plane) into op categories — MXU work
(convolution/dot) vs HBM-bound fusions (kLoop/kInput/kOutput elementwise +
reduce) vs copy/layout — and computing the device duty cycle from the
module-level "Steps" line.

Usage (from /root/repo, TPU relay up):
    python scripts/_trace_train_step.py [out_dir]
    MMFN_TRACE_BATCH=96 MMFN_TRACE_STEPS=10 python scripts/_trace_train_step.py

Prints one JSON line (also written to docs/traces/ when run from the repo).
The raw xplane (~120 MB for 20 steps) stays under out_dir for TensorBoard.

Round-4 measurement (batch 24 bf16, 20 steps): device step 51.48 ms at 99.6%
duty cycle; 58.5% of device time in HBM-bound fusions + 6.4% copy/layout vs
33.3% in MXU ops — the step is MEASURED memory-bound on the device timeline.
"""
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model
from mmfn_tpu.train import create_train_state
from mmfn_tpu.train.engine import create_optimizer, make_train_step

BATCH = int(os.environ.get("MMFN_TRACE_BATCH", "24"))
STEPS = int(os.environ.get("MMFN_TRACE_STEPS", "20"))


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmfn_trace_r04"
    cfg = GlobalConfig()
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=BATCH, max_lanes=cfg.max_lanes)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, create_optimizer(cfg),
                           compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(1)

    # Warm up: compile + a few runs so the trace window holds steady state.
    for _ in range(3):
        state, metrics = step(state, batch, rng)
    _ = float(jax.tree.leaves(metrics)[0])

    jax.profiler.start_trace(out_dir)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, rng)
    loss = float(jax.tree.leaves(metrics)[0])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    summary = {
        "batch": BATCH,
        "steps_traced": STEPS,
        "compute_dtype": "bfloat16",
        "wall_ms_per_step": round(wall / STEPS * 1e3, 2),
        "loss_finite": bool(loss == loss),
        "trace_dir": out_dir,
    }
    path = find_xplane(out_dir)
    if path is None:
        summary["note"] = "no xplane.pb produced"
    else:
        summary["xplane"] = os.path.relpath(path, out_dir)
        summary.update(aggregate_xplane(path))
    line = json.dumps(summary)
    print(line)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art_dir = os.path.join(repo, "docs", "traces")
    if os.path.isdir(os.path.dirname(art_dir)):
        os.makedirs(art_dir, exist_ok=True)
        with open(os.path.join(art_dir,
                               f"train_step_bf16_b{BATCH}.json"), "w") as f:
            f.write(json.dumps(summary, indent=1) + "\n")


def find_xplane(out_dir: str) -> str | None:
    for root, _dirs, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                return os.path.join(root, f)
    return None


def _category(name: str) -> str:
    """Bucket an HLO-op trace event by what hardware unit bounds it."""
    if "convolution" in name:
        return "convolution (MXU)"
    if re.search(r"= \S+ dot\(|dot_general|%dot", name):
        return "dot (MXU)"
    if "kind=kLoop" in name or "kind=kInput" in name:
        if "conv" in name or "dot" in name:
            return "fusion:conv/dot (MXU)"
        return "fusion:elementwise/reduce (HBM-bound)"
    if "kind=kOutput" in name:
        if "conv" in name or "dot" in name:
            return "fusion:conv/dot (MXU)"
        return "fusion:output (HBM-bound)"
    if "kind=kCustom" in name:
        return "fusion:custom"
    if "copy" in name or "bitcast" in name or "transpose" in name:
        return "copy/layout"
    if ("all-reduce" in name or "reduce-scatter" in name
            or "all-gather" in name):
        return "collective"
    if "reduce" in name:
        return "reduce"
    return "other"


def aggregate_xplane(path: str) -> dict:
    pd = jax.profiler.ProfileData.from_file(path)
    cats = collections.Counter()
    cat_counts = collections.Counter()
    steps: list[float] = []
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name == "Steps":
                steps = [ev.duration_ns for ev in line.events]
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                c = _category(ev.name)
                cats[c] += ev.duration_ns
                cat_counts[c] += 1
    if not steps:
        return {"note": "no device Steps line in trace"}
    n = len(steps)
    step_ms = sum(steps) / n / 1e6
    busy_ms = sum(cats.values()) / n / 1e6
    mxu = sum(v for k, v in cats.items() if "MXU" in k)
    hbm = sum(v for k, v in cats.items() if "HBM-bound" in k)
    total = sum(cats.values())
    return {
        "device_step_ms": round(step_ms, 3),
        "xla_ops_busy_ms_per_step": round(busy_ms, 3),
        "duty_cycle_pct": round(100 * busy_ms / step_ms, 1),
        "mxu_pct": round(100 * mxu / total, 1),
        "hbm_bound_fusion_pct": round(100 * hbm / total, 1),
        "category_ms_per_step": {k: round(v / n / 1e6, 3)
                                 for k, v in cats.most_common()},
        "category_op_counts_per_step": {k: v // n
                                        for k, v in cat_counts.items()},
    }


if __name__ == "__main__":
    main()
