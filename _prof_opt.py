"""Measure optax.flatten effect on the full train step (batch 24, f32)."""
import os
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model
from mmfn_tpu.train import create_train_state
from mmfn_tpu.train.engine import create_optimizer, make_train_step

BATCH = 24
ITERS = 20

cfg = GlobalConfig()
model = build_model(cfg, "rad")
batch = synthetic_batch(batch_size=BATCH, max_lanes=cfg.max_lanes)
print("device:", jax.devices()[0])

def time_loop(tx, tag):
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx=tx)
    step = make_train_step(model, tx)
    # unjitted composition inside fori_loop for relay-safe timing
    raw = step.__wrapped__ if hasattr(step, "__wrapped__") else None

    @jax.jit
    def looped(state, batch, rng):
        def body(i, carry):
            st, acc = carry
            b = batch._replace(velocity=batch.velocity + i.astype(jnp.float32) * 1e-9)
            st, loss = step(st, b, rng)
            return (st, acc + loss)
        return jax.lax.fori_loop(0, ITERS, body, (state, jnp.float32(0.0)))

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    _, acc = looped(state, batch, rng)
    _ = float(acc)
    print(f"{tag}: compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = looped(state, batch, rng)
        _ = float(acc)
        ts.append(time.perf_counter() - t0)
    print(f"{tag}: {min(ts)/ITERS*1e3:.2f} ms/step", flush=True)
    return min(ts) / ITERS * 1e3

base = time_loop(create_optimizer(cfg), "adamw")
flat = time_loop(optax.flatten(create_optimizer(cfg)), "flatten(adamw)")
print(f"speedup {base/flat:.3f}x")
