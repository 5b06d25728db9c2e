"""Profile the train step in segments on the real TPU (relay-safe fori_loop timing)."""
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


def loss_fn(params, batch_stats, batch):
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch, True, rngs={"dropout": rng_key}, mutable=["batch_stats"])
    return waypoint_l1_loss(out, batch.waypoints), mutated["batch_stats"]


def fwd_only(state, batch):
    loss, _ = loss_fn(state.params, state.batch_stats, batch)
    return loss


def fwd_bwd(state, batch):
    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, batch)
    # reduce grads to a scalar so the loop carry stays small
    return loss + sum(jnp.sum(g) * 0.0 for g in jax.tree.leaves(grads))


def full_step(state, batch):
    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, batch)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, batch_stats=stats,
                         opt_state=opt_state, step=state.step + 1), loss


def time_scalar_loop(fn, tag):
    @jax.jit
    def looped(state, batch):
        def body(i, acc):
            b = batch._replace(velocity=batch.velocity + i.astype(jnp.float32) * 1e-9 + acc * 0.0)
            return acc + fn(state, b)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    t0 = time.time()
    _ = float(looped(state, batch))
    print(f"{tag}: compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(looped(state, batch))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / ITERS * 1e3
    print(f"{tag}: {ms:.2f} ms/step")
    return ms


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
    print(f"{tag}: compile+run {time.time()-t0:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, acc = looped(state, batch)
        _ = float(acc)
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / ITERS * 1e3
    print(f"{tag}: {ms:.2f} ms/step")
    return ms


# FLOPs estimate from the compiled single step
step_j = jax.jit(full_step)
lowered = step_j.lower(state, batch)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", 0.0)
print(f"full-step XLA flops: {flops/1e12:.3f} TFLOP, bytes accessed: {ca.get('bytes accessed', 0)/1e9:.2f} GB")

f = time_scalar_loop(fwd_only, "fwd-only")
fb = time_scalar_loop(fwd_bwd, "fwd+bwd")
fs = time_state_loop(full_step, "full-step")
print(f"\nsummary: fwd {f:.1f} ms | +bwd {fb:.1f} ms | +opt {fs:.1f} ms")
print(f"implied TFLOP/s at full step: {flops/1e12/(fs/1e3):.1f}")
