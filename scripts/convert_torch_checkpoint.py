#!/usr/bin/env python
"""Convert a reference PyTorch MMFN checkpoint (best_model.pth) into this
framework's msgpack TrainState so e2e agents / phase0 can load it.

Usage:
    python scripts/convert_torch_checkpoint.py best_model.pth out_dir \
        --variant vec [--max-lanes 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--variant", default="vec",
                    choices=("img", "vec", "rad", "aim", "cilrs", "transfuser"))
    ap.add_argument("--max-lanes", type=int, default=64)
    ap.add_argument("--n-layer", type=int, default=8,
                    help="fusion-transformer depth of the checkpoint (reference: 8)")
    args = ap.parse_args()

    import jax
    import numpy as np
    from flax import serialization

    from mmfn_tpu.config import GlobalConfig
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.models import build_model, get_entry_point
    from mmfn_tpu.train import create_train_state
    from mmfn_tpu.utils.weights import CONVERTERS, load_torch_state_dict

    cfg = GlobalConfig(max_lanes=args.max_lanes, n_layer=args.n_layer)
    if args.variant in ("img", "vec", "rad"):
        model = build_model(cfg, args.variant)
    else:
        model = get_entry_point(args.variant)(cfg)
    # template init at low resolution: parameter shapes are resolution-agnostic
    # and the 64px trace compiles an order of magnitude faster
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes, resolution=64)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)

    sd = load_torch_state_dict(args.torch_checkpoint)
    converted = CONVERTERS[args.variant](sd, n_layer=cfg.n_layer)

    # graft converted leaves onto the template (keeps optimizer state shapes)
    def graft(template, new):
        if isinstance(template, dict):
            return {k: graft(template[k], new[k]) if k in new else template[k]
                    for k in template}
        return np.asarray(new, dtype=np.asarray(template).dtype)

    params = graft(jax.tree.map(np.asarray, dict(state.params)), converted["params"])
    stats = graft(jax.tree.map(np.asarray, dict(state.batch_stats)),
                  converted["batch_stats"])
    state = state.replace(params=params, batch_stats=stats)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, "best_model.msgpack")
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(state))
    n_params = sum(np.asarray(x).size for x in jax.tree.leaves(params))
    print(f"wrote {out} ({n_params / 1e6:.1f}M params, variant={args.variant})")


if __name__ == "__main__":
    main()
