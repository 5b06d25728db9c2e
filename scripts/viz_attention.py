#!/usr/bin/env python
"""Render fusion-attention heatmaps for an MMFN variant.

TPU rebuild of the reference's TransFuser attention-viz tooling
(team_code/benchmarks/transfuser/{model_viz.py,viz.py}): runs one forward
pass with attention capture and writes, per fusion stage, (a) the full
token-to-token attention matrix and (b) cross-modality 8x8 spatial maps
(e.g. how image tokens attend over the LiDAR BEV grid) upsampled and
overlaid on the input.

Usage:
    python scripts/viz_attention.py --variant rad --out /tmp/att \
        [--checkpoint ckpt.msgpack] [--seed N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODALITY_NAMES = {
    "img": ("image", "map", "lidar"),
    "vec": ("image", "vectormap", "lidar"),
    "rad": ("image", "vectormap", "lidar", "radar"),
}


def overlay(base_hw3: np.ndarray, heat: np.ndarray) -> np.ndarray:
    import cv2

    h, w = base_hw3.shape[:2]
    heat = cv2.resize(heat.astype(np.float32), (w, h),
                      interpolation=cv2.INTER_LINEAR)
    heat = (255 * (heat - heat.min()) / (np.ptp(heat) + 1e-9)).astype(np.uint8)
    heat = cv2.applyColorMap(heat, cv2.COLORMAP_JET)
    return cv2.addWeighted(base_hw3.astype(np.uint8), 0.5, heat, 0.5, 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="rad", choices=("img", "vec", "rad"))
    ap.add_argument("--out", default="/tmp/mmfn_attention")
    ap.add_argument("--checkpoint", default=None,
                    help="flax msgpack TrainState checkpoint (default: random init)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2
    import jax

    from mmfn_tpu.config import GlobalConfig
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.models import build_model
    from mmfn_tpu.utils.introspection import (
        attention_weights, forward_with_intermediates, token_attention_image)

    cfg = GlobalConfig()
    model = build_model(cfg, args.variant)
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes,
                            seed=args.seed)
    # jitted init: bare model.init runs the forward eagerly op-by-op
    # (minutes on CPU, one relay round-trip per op on TPU — CLAUDE.md)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), batch, False)
    if args.checkpoint:
        from flax import serialization

        from mmfn_tpu.train import create_train_state

        template = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
        with open(args.checkpoint, "rb") as f:
            state = serialization.from_bytes(template, f.read())
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    def keep(mdl, method):
        return type(mdl).__name__ == "SelfAttention"

    _, inter = forward_with_intermediates(model, variables, batch,
                                          filter_fn=keep)
    maps = attention_weights(inter)
    if not maps:
        print("no attention maps captured", file=sys.stderr)
        return 1

    os.makedirs(args.out, exist_ok=True)
    names = MODALITY_NAMES[args.variant]
    image = np.asarray(batch.image[0])
    image = (255 * (image - image.min()) / (np.ptp(image) + 1e-9)).astype(np.uint8)

    written = []
    for path, att in sorted(maps.items()):
        stage = path.replace("/", "_")
        full = att.mean(axis=(0, 1))
        full_img = (255 * full / (full.max() + 1e-9)).astype(np.uint8)
        p = os.path.join(args.out, f"{stage}_tokens.png")
        cv2.imwrite(p, cv2.applyColorMap(
            cv2.resize(full_img, (512, 512), interpolation=cv2.INTER_NEAREST),
            cv2.COLORMAP_VIRIDIS))
        written.append(p)
        n_groups = att.shape[-1] // 64
        for qg in range(min(n_groups, len(names))):
            for kg in range(min(n_groups, len(names))):
                if qg == kg:
                    continue
                heat = token_attention_image(att, qg, kg)
                p = os.path.join(
                    args.out, f"{stage}_{names[qg]}_to_{names[kg]}.png")
                cv2.imwrite(p, overlay(image, heat))
                written.append(p)

    print(f"wrote {len(written)} heatmaps to {args.out} "
          f"({len(maps)} attention layers captured)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
