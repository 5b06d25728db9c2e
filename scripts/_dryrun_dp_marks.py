"""Fine-grained marks for the dryrun's dp phase AS SHIPPED (fast_init +
persistent cache + ISA pin) — where do 270 s go on a warm cache? (not shipped)
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
    + " --xla_cpu_max_isa=AVX2").strip()

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".dryrun_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t = time.time()


def mark(label):
    global t
    now = time.time()
    print(f"{label}: {now - t:.1f}s", flush=True)
    t = now


from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model
from mmfn_tpu.parallel import make_mesh, replicate, shard_batch
from mmfn_tpu.train import fast_init_train_state, make_train_step
from mmfn_tpu.train.engine import create_optimizer

mark("imports")
n = 8
cfg = GlobalConfig(n_layer=8, max_lanes=8)
model = build_model(cfg, "rad")
batch = synthetic_batch(batch_size=n, max_lanes=8, resolution=32)
mark("model+batch")
mesh = make_mesh(n)
state = fast_init_train_state(model, cfg, jax.random.PRNGKey(0), batch)
jax.block_until_ready(state.params)
mark("fast_init")
state = replicate(state, mesh)
jax.block_until_ready(state.params)
batch = shard_batch(batch, mesh)
mark("replicate+shard")
step = make_train_step(model, create_optimizer(cfg))
lowered = jax.jit(step).lower(state, batch, jax.random.PRNGKey(1))
mark("trace+lower")
compiled = lowered.compile()
mark("compile (cached?)")
state2, loss = compiled(state, batch, jax.random.PRNGKey(1))
print("loss", float(loss))
mark("execute")
