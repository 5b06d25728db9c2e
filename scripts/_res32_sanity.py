"""Sanity: full MMFN-rad compiles and runs at resolution 32 (stage-4 1x1)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model

cfg = GlobalConfig(n_layer=1, max_lanes=8)
model = build_model(cfg, "rad")
batch = synthetic_batch(batch_size=2, max_lanes=8, resolution=32)
variables = jax.jit(model.init, static_argnums=(2,))(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    batch, False)
out = jax.jit(lambda v, b: model.apply(v, b, False))(variables, batch)
assert jnp.isfinite(out).all(), out
print("res32 ok:", out.shape)
