"""Probe: does pinning --xla_cpu_max_isa make the persistent XLA:CPU cache
reload-safe (cpu_aot_loader machine-feature mismatch)? Run twice with the
same CACHE_DIR; second run should hit the cache and NOT abort."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/isa_cache"
ISA = sys.argv[2] if len(sys.argv) > 2 else "AVX2"

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_cpu_max_isa={ISA}").strip()
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))

@jax.jit
def step(x, w):
    y = jnp.tanh(x @ w)
    return (y @ w.T).sum()

x = jax.device_put(np.ones((8, 128), np.float32),
                   NamedSharding(mesh, P("data", None)))
w = jax.device_put(np.ones((128, 128), np.float32),
                   NamedSharding(mesh, P()))
t = time.time()
out = float(step(x, w))
print(f"ok out={out:.1f} [{time.time()-t:.2f}s] cache={sorted(os.listdir(CACHE)) if os.path.isdir(CACHE) else 'none'}")
