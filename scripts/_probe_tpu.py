import time, jax, jax.numpy as jnp
t0=time.time(); print("devices:", jax.devices(), f"{time.time()-t0:.1f}s", flush=True)
t0=time.time()
x = jnp.ones((1024,1024))
y = (x @ x).sum()
print("matmul sum:", float(y), f"{time.time()-t0:.1f}s", flush=True)
