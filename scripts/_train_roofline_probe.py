"""Train-step roofline evidence on silicon (VERDICT r2 #4, not shipped).

Lowers the engine's jitted bf16 train step at batch 24/96, pulls XLA's own
cost_analysis (flops + bytes accessed) from the compiled executable, measures
the fori-loop-chained step time (bench.py methodology), and prints the
implied compute vs memory roofline against v5e peaks. Optionally captures a
jax.profiler trace (MMFN_TRACE_DIR=...) — through the axon relay the device
timeline may be unavailable; cost_analysis does not depend on it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model
from mmfn_tpu.train import create_train_state
from mmfn_tpu.train.engine import create_optimizer, make_train_step

V5E_BF16_TFLOPS = 197.0     # peak systolic bf16
V5E_HBM_GBS = 819.0         # peak HBM bandwidth

cfg = GlobalConfig()
model = build_model(cfg, "rad")

for batch_size in (24, 96):
    batch = synthetic_batch(batch_size=batch_size, max_lanes=cfg.max_lanes)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, create_optimizer(cfg),
                           compute_dtype=jnp.bfloat16)
    # make_train_step returns a jitted fn; lower/compile explicitly for
    # cost_analysis
    lowered = step.lower(state, batch, jax.random.PRNGKey(1)) \
        if hasattr(step, "lower") else jax.jit(step).lower(
            state, batch, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    byac = float(ca.get("bytes accessed", float("nan")))

    # measured step time: chained fori_loop (relay-safe)
    import bench
    step_s = bench.timed_train(model, cfg, batch_size, iters=10,
                               compute_dtype=jnp.bfloat16)

    t_flops = flops / (V5E_BF16_TFLOPS * 1e12)
    t_bytes = byac / (V5E_HBM_GBS * 1e9)
    print(json.dumps({
        "batch": batch_size,
        "step_ms": round(step_s * 1e3, 2),
        "fps": round(batch_size / step_s, 1),
        "xla_tflop_per_step": round(flops / 1e12, 3),
        "xla_gbytes_accessed": round(byac / 1e9, 2),
        "roofline_compute_ms": round(t_flops * 1e3, 2),
        "roofline_memory_ms": round(t_bytes * 1e3, 2),
        "mfu_pct": round(100 * t_flops / step_s, 1),
        "hbm_bw_util_pct": round(100 * t_bytes / step_s, 1),
        "bound": "memory" if t_bytes > t_flops else "compute",
    }), flush=True)

trace_dir = os.environ.get("MMFN_TRACE_DIR")
if trace_dir:
    from mmfn_tpu.utils.profiling import trace
    batch = synthetic_batch(batch_size=24, max_lanes=cfg.max_lanes)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, create_optimizer(cfg),
                           compute_dtype=jnp.bfloat16)
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    float(loss)
    with trace(trace_dir):
        for _ in range(5):
            state, loss = step(state, batch, jax.random.PRNGKey(1))
        print("traced loss", float(loss))
    print("trace written to", trace_dir, os.listdir(trace_dir))
