"""Device-mesh helpers for data-parallel training.

The reference's only parallelism is DDP over NCCL (phase2_train_net.py:225-275,
gradient allreduce). The TPU-native equivalent is GSPMD: build a 1-D
``Mesh(('data',))``, shard the batch over it, keep params replicated, and jit
the train step — XLA inserts the gradient all-reduce over ICI automatically.
Multi-host extends the same mesh across slices via ``jax.distributed``
(initialize() before calling make_mesh on each host).

MMFN is ~50 M params with <=256-token attention, so data parallelism is the
whole story (SURVEY.md §2.8); the mesh helpers nonetheless accept extra axes
so model-sharded experiments compose.
"""

from __future__ import annotations

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
