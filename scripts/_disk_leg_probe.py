"""Reproduce bench.py's disk_train_bench leg with the traceback visible."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: F401
from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.models import build_model

import bench

cfg = GlobalConfig()
model = build_model(cfg, "rad")
out = bench.disk_train_bench(model, cfg, batch_size=24)
print(out)
