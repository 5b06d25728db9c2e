"""Measure bf16-activation train-step variants vs the f32 baseline (batch 24)."""
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
from mmfn_tpu.train.engine import create_optimizer, waypoint_l1_loss

BATCH = 24
ITERS = 20

cfg = GlobalConfig()
model = build_model(cfg, "rad")
batch = synthetic_batch(batch_size=BATCH, max_lanes=cfg.max_lanes)
state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
tx = create_optimizer(cfg)
rng_key = jax.random.PRNGKey(1)
print("device:", jax.devices()[0])


def cast_tree(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def make_step(bf16):
    def step(state, batch):
        def loss_fn(params):
            p = cast_tree(params, jnp.bfloat16) if bf16 else params
            b = cast_tree(batch, jnp.bfloat16) if bf16 else batch
            bs = cast_tree(state.batch_stats, jnp.bfloat16) if bf16 else state.batch_stats
            out, mutated = model.apply(
                {"params": p, "batch_stats": bs},
                b, True, rngs={"dropout": rng_key}, mutable=["batch_stats"])
            loss = waypoint_l1_loss(out.astype(jnp.float32),
                                    batch.waypoints)
            return loss, mutated["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = cast_tree(grads, jnp.float32)
        stats = cast_tree(stats, jnp.float32)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=stats,
                             opt_state=opt_state, step=state.step + 1), loss
    return step


def time_state_loop(fn, tag):
    @jax.jit
    def looped(state, batch):
        def body(i, carry):
            st, acc = carry
            b = batch._replace(velocity=batch.velocity + i.astype(jnp.float32) * 1e-9)
            st, loss = fn(st, b)
            return (st, acc + loss)
        return jax.lax.fori_loop(0, ITERS, body, (state, jnp.float32(0.0)))

    t0 = time.time()
    _, acc = looped(state, batch)
    _ = float(acc)
    print(f"{tag}: compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = looped(state, batch)
        _ = float(acc)
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / ITERS * 1e3
    print(f"{tag}: {ms:.2f} ms/step", flush=True)
    return ms


base = time_state_loop(make_step(False), "f32 full-step")
b16 = time_state_loop(make_step(True), "bf16-activation full-step")
print(f"\nspeedup: {base/b16:.2f}x  ({base:.1f} -> {b16:.1f} ms)")
