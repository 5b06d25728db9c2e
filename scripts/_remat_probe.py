"""A/B: rematerialized BasicBlock/GPT-Block vs baseline train step (not
shipped). The roofline probe shows the step at 92% of the HBM-BW roofline
with 24% MFU — remat trades cheap flops for the expensive bytes. Also tries
batches beyond the non-remat OOM wall (>=144)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn

import bench
from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.models import build_model
import mmfn_tpu.models.resnet as resnet_mod
import mmfn_tpu.models.gpt as gpt_mod

cfg = GlobalConfig()
mode = sys.argv[1] if len(sys.argv) > 1 else "remat"

if mode == "remat":
    # static_argnums: 0 is the module itself in flax's lifted call signature
    resnet_mod.BasicBlock = nn.remat(resnet_mod.BasicBlock, static_argnums=(2,))
    gpt_mod.Block = nn.remat(gpt_mod.Block, static_argnums=(2,))

model = build_model(cfg, "rad")

for batch_size in (24, 96, 144):
    try:
        step_s = bench.timed_train(model, cfg, batch_size, iters=10,
                                   compute_dtype=jnp.bfloat16)
        print(json.dumps({"mode": mode, "batch": batch_size,
                          "step_ms": round(step_s * 1e3, 2),
                          "fps": round(batch_size / step_s, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"mode": mode, "batch": batch_size,
                          "error": type(e).__name__}), flush=True)
