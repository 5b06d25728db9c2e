"""Export a trained checkpoint as an AOT serving artifact.

Replaces the reference's deployment story (construct the torch module inside
the agent process and torch.load a .pth, mmfn_vectornet.py:117-129) with a
compiler-level artifact: jax.export-serialized StableHLO of the inference
forward, batch-polymorphic, optionally lowered for several platforms from
this (CPU) host. The weights stay in their own file next to the artifact —
see mmfn_tpu/serving/export.py.

Usage:
  python scripts/export_model.py --logdir runs/rad --variant rad \
      --out serving/mmfn_rad.jaxexport --platforms tpu,cpu

The serving side needs only:
  exp = mmfn_tpu.serving.load_exported("mmfn_rad.jaxexport")
  variables = flax.serialization.msgpack_restore(open("...vars.msgpack","rb").read())
  waypoints = jax.jit(exp.call)(variables, batch)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--logdir", required=True,
                    help="training logdir holding model.msgpack/recent.log")
    ap.add_argument("--checkpoint", default="best_model.msgpack",
                    help="checkpoint file inside --logdir")
    ap.add_argument("--variant", default="rad",
                    choices=["img", "vec", "rad", "aim", "cilrs", "transfuser"])
    ap.add_argument("--out", required=True, help="artifact output path")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering targets, e.g. tpu,cpu "
                         "(default: current backend)")
    ap.add_argument("--batch", type=int, default=0,
                    help="concrete batch size (default 0 = symbolic, one "
                         "artifact for any batch)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (export needs no device)")
    ap.add_argument("--n-layer", type=int, default=0,
                    help="override fusion depth (0 = config default); must "
                         "match the checkpoint's architecture")
    ap.add_argument("--max-lanes", type=int, default=0,
                    help="override the static lane pad (0 = config default)")
    ap.add_argument("--resolution", type=int, default=0,
                    help="override the input resolution (0 = config default)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from flax import serialization

    from mmfn_tpu.config import GlobalConfig
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.models import build_model
    from mmfn_tpu.serving import export_forward, save_exported
    from mmfn_tpu.train import create_train_state

    overrides = {}
    if args.n_layer:
        overrides["n_layer"] = args.n_layer
    if args.max_lanes:
        overrides["max_lanes"] = args.max_lanes
    cfg = GlobalConfig(**overrides)
    model = build_model(cfg, args.variant)
    sample = synthetic_batch(batch_size=max(1, args.batch),
                             max_lanes=cfg.max_lanes,
                             **({"resolution": args.resolution}
                                if args.resolution else {}))
    template = create_train_state(model, cfg, jax.random.PRNGKey(0), sample)
    ckpt = os.path.join(args.logdir, args.checkpoint)
    with open(ckpt, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 or None)
    exported = export_forward(model, variables, sample, platforms=platforms,
                              symbolic_batch=args.batch == 0)
    save_exported(exported, args.out)

    vars_out = os.path.splitext(args.out)[0] + ".vars.msgpack"
    with open(vars_out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    print(f"exported {args.variant} from {ckpt}:")
    print(f"  artifact   {args.out} ({os.path.getsize(args.out)} bytes, "
          f"platforms={exported.platforms}, "
          f"batch={'symbolic' if args.batch == 0 else args.batch})")
    print(f"  variables  {vars_out} ({os.path.getsize(vars_out)} bytes)")


if __name__ == "__main__":
    main()
