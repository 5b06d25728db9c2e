"""Device-mesh helpers: data-parallel and tensor-parallel GSPMD sharding.

The reference's only parallelism is DDP over NCCL (phase2_train_net.py:225-275,
gradient allreduce). The TPU-native equivalent is GSPMD: build a 1-D
``Mesh(('data',))``, shard the batch over it, keep params replicated, and jit
the train step — XLA inserts the gradient all-reduce over ICI automatically.
Multi-host extends the same mesh across slices via ``jax.distributed``
(initialize() before calling make_mesh on each host).

MMFN is ~50 M params with <=256-token attention, so data parallelism covers
training at the reference's scale (SURVEY.md §2.8). Beyond that, the fusion
transformer (4 stages x n_layer blocks — the parameter majority) supports
Megatron-style tensor parallelism over a second ``'model'`` mesh axis
(:func:`tensor_parallel_sharding`): attention QKV and MLP fc1 kernels are
column-sharded, proj/fc2 row-sharded, so each block runs one all-reduce per
sublayer over ICI — the standard TP layout XLA recovers from these
annotations. Use ``make_mesh(n, axes=('data','model'), axis_sizes=(d, m))``
and shard the train state with ``tensor_parallel_sharding`` instead of
``replicate``.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              axis_sizes: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With the default single axis, all devices go to 'data'. Pass axis_sizes
    to factor the devices over multiple axes, e.g. axes=('data','model'),
    axis_sizes=(4, 2).
    """
    devices = jax.devices()[: (n_devices or len(jax.devices()))]
    if axis_sizes is None:
        axis_sizes = (len(devices),) + (1,) * (len(axes) - 1)
    grid = np.asarray(devices).reshape(axis_sizes)
    return Mesh(grid, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def _place(x, sharding: NamedSharding):
    """Host-local numpy -> global array under `sharding`.

    Single-process: a plain device_put. Multi-process: device_put cannot
    target non-addressable devices, and each host holds only ITS slice of
    the global batch (the loader shards by process_index) — assemble the
    global array from per-process shards instead. For a replicated spec the
    process-local data is the full (identical-by-seed) value, which the same
    primitive handles.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array leaf of a batch pytree with the leading dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: _place(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: _place(x, sharding), tree)


# Megatron-style rules for the fusion transformer (models/gpt.py): QKV and
# fc1 split output features (column parallel), proj and fc2 split input
# features (row parallel) so their matmul partial sums all-reduce once per
# sublayer. Column-parallel biases shard with their features; row-parallel
# biases (applied after the all-reduce) and everything else replicate.
# Matched against the '/'-joined param path, so the same rules cover the
# optimizer-state mirrors (AdamW mu/nu) inside a TrainState.
_TP_RULES = (
    (re.compile(r"attn/(key|query|value)/kernel$"), P(None, "model")),
    (re.compile(r"attn/(key|query|value)/bias$"), P("model")),
    (re.compile(r"attn/proj/kernel$"), P("model", None)),
    (re.compile(r"fc1/kernel$"), P(None, "model")),
    (re.compile(r"fc1/bias$"), P("model")),
    (re.compile(r"fc2/kernel$"), P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tensor_parallel_sharding(tree, mesh: Mesh):
    """Place a pytree (params or a whole TrainState) with the fusion
    transformer tensor-sharded over the mesh's ``'model'`` axis and every
    other leaf replicated. The 'data' axis never shards parameters, so this
    composes with batch sharding on a ('data', 'model') mesh."""
    def place(path, x):
        spec = P()
        s = _path_str(path)
        for pat, p in _TP_RULES:
            if pat.search(s):
                spec = p
                break
        return _place(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, tree)
