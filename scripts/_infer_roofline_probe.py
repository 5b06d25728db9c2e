"""Inference roofline evidence on silicon (not shipped): XLA cost_analysis
of the batched sensor->waypoints pipeline (bench.py's program) vs v5e peaks,
plus the measured fori-chained step time."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.batch import Batch
from mmfn_tpu.models import build_model
from mmfn_tpu.ops.radar import radar_adjacency

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0

rng = np.random.default_rng(0)
cfg = GlobalConfig()
model = build_model(cfg, "rad")
inp = bench.make_inputs(1, rng)
init_batch = Batch(
    image=inp["image"], lidar_bev=jnp.zeros((1, 256, 256, 2)),
    lanes=inp["lanes"], lane_num=inp["lane_num"], radar=inp["radar"],
    radar_adj=radar_adjacency(inp["radar"]),
    target_point=inp["target_point"], velocity=inp["velocity"])
variables = jax.jit(model.init, static_argnums=(2,))(
    {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
    init_batch, False)
pipeline = bench.pipeline_fn(model)

for batch_size in (1, 8, 64):
    inputs = bench.make_inputs(batch_size, rng)
    compiled = jax.jit(pipeline).lower(variables, inputs).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    byac = float(ca.get("bytes accessed", float("nan")))
    step_s = bench.timed_loop(pipeline, variables, inputs, 100)
    t_f = flops / (V5E_BF16_TFLOPS * 1e12)
    t_b = byac / (V5E_HBM_GBS * 1e9)
    print(json.dumps({
        "batch": batch_size,
        "step_ms": round(step_s * 1e3, 3),
        "fps": round(batch_size / step_s, 1),
        "tflop_per_step": round(flops / 1e12, 4),
        "gbytes_accessed": round(byac / 1e9, 3),
        "roofline_compute_ms": round(t_f * 1e3, 3),
        "roofline_memory_ms": round(t_b * 1e3, 3),
        "mfu_pct": round(100 * t_f / step_s, 1),
        "hbm_bw_util_pct": round(100 * t_b / step_s, 1),
        "bound": "memory" if t_b > t_f else "compute",
    }), flush=True)
