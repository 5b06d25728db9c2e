"""Subprocess body for the full-depth MMFN mesh-equivalence test.

Run by tests/test_train.py::test_data_parallel_mesh_full_mmfn via a cleaned
environment: with the axon TPU-relay plugin registered (sitecustomize), the
XLA:CPU ThunkExecutor aborts on this train step's very large thunk graph —
the same program runs fine in a process without the relay env (see
CLAUDE.md). Prints one JSON line with the equivalence results.
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
    from mmfn_tpu.parallel import make_mesh, replicate, shard_batch
    from mmfn_tpu.train import create_train_state, make_train_step

    cfg = GlobalConfig(max_lanes=8, n_layer=8, lr=1e-3)
    model = build_model(cfg, "rad")
    batch8 = synthetic_batch(batch_size=8, max_lanes=8, resolution=64)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch8)
    state_host = jax.tree.map(np.asarray, state)
    step = make_train_step(model, optax.adamw(cfg.lr))
    rng = jax.random.PRNGKey(7)

    def dev(s):
        return jax.tree.map(jax.numpy.asarray, s)

    state_single, loss_single = step(dev(state_host), batch8, rng)

    mesh = make_mesh(8)
    state_mesh, loss_mesh = step(replicate(dev(state_host), mesh),
                                 shard_batch(batch8, mesh), rng)

    param_max = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(jax.tree.leaves(state_single.params),
                        jax.tree.leaves(state_mesh.params)))
    # BN running stats scale with activation variance (raw 0-255 inputs);
    # normalize by (1 + |a|): absolute for O(1) elements, relative for the
    # large variance entries
    stats_rel = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))
                     / (1.0 + np.abs(np.asarray(a)))))
        for a, b in zip(jax.tree.leaves(state_single.batch_stats),
                        jax.tree.leaves(state_mesh.batch_stats)))
    print(json.dumps({
        "loss_single": float(loss_single),
        "loss_mesh": float(loss_mesh),
        "lr": cfg.lr,
        "param_max_diff": param_max,
        "stats_rel_diff": stats_rel,
        "n_devices": len(jax.devices()),
    }))


if __name__ == "__main__":
    main()
