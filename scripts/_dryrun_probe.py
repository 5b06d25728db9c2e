"""Fine-grained timing probe for dryrun_multichip phases (not shipped).

Usage: python scripts/_dryrun_probe.py [dp|tp] — prints init/compile/execute
split. Honors EXTRA_XLA_FLAGS for experiments.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    + " --xla_llvm_disable_expensive_passes=true"
    + " " + os.environ.get("EXTRA_XLA_FLAGS", "")).strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model
from mmfn_tpu.parallel import (make_mesh, replicate, shard_batch,
                               tensor_parallel_sharding)
from mmfn_tpu.train import create_train_state, make_train_step
from mmfn_tpu.train.engine import create_optimizer

mode = sys.argv[1] if len(sys.argv) > 1 else "dp"
n = 8
t = time.time()

def mark(label):
    global t
    now = time.time()
    print(f"{label}: {now - t:.1f}s", flush=True)
    t = now

if mode == "dp":
    cfg = GlobalConfig(n_layer=8, max_lanes=8)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=n, max_lanes=8, resolution=32)
    mesh = make_mesh(n)
    mark("setup")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)
    mark("init (compile+run)")
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    mark("placement")
    step = make_train_step(model, create_optimizer(cfg))
    lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1))
    mark("trace+lower")
    compiled = lowered.compile()
    mark("compile")
    state2, loss = compiled(state, batch, jax.random.PRNGKey(1))
    print("loss", float(loss))
    mark("execute")
else:
    cfg = GlobalConfig(n_layer=1, max_lanes=8)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=n, max_lanes=8, resolution=32)
    mesh2 = make_mesh(n, axes=("data", "model"), axis_sizes=(n // 2, 2))
    mark("setup")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state.params)
    mark("init (compile+run)")
    state = tensor_parallel_sharding(state, mesh2)
    batch = shard_batch(batch, mesh2)
    mark("placement")
    step = make_train_step(model, create_optimizer(cfg))
    lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1))
    mark("trace+lower")
    compiled = lowered.compile()
    mark("compile")
    state2, loss = compiled(state, batch, jax.random.PRNGKey(1))
    print("loss", float(loss))
    mark("execute")
