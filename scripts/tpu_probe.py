"""Quick TPU-relay health probe: device list + one tiny matmul round-trip.

Run with `timeout 120 python scripts/tpu_probe.py` — if it prints nothing
within the timeout the relay is down (see CLAUDE.md environment traps); the
test suite is unaffected (CPU-pinned) but bench.py will hang.
"""
import time
import jax
import jax.numpy as jnp

t0 = time.time()
print("devices:", jax.devices(), flush=True)
x = jnp.ones((1024, 1024))
y = (x @ x).sum()
print("matmul sum:", float(y), "elapsed", round(time.time() - t0, 1), "s", flush=True)
