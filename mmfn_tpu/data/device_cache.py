"""Device-resident dataset cache: HBM-cached epochs for small datasets.

The reference streams every batch host->GPU each step
(phase2_train_net.py:67-103). Through a thin host<->device link that
transport BOUNDS training: the measured from-disk rate on this relay is
~130 fps vs the 435-490 fps the chip's train step sustains
(docs/PERFORMANCE.md). MMFN-scale datasets are small (10k frames ~= 5.4 GB
in transport dtypes) while a v5e chip has 16 GB of HBM — so the TPU-native
answer is to upload the WHOLE dataset once, in the same lossless transport
dtypes the loader already uses (camera/map rasters as uint8, the BEV grid
as uint8 counts — bit-exact, see bench.py u8 transport), and gather each
shuffled batch on device with a tiny jitted program. After the one-time
cache fill, epochs are fully decoupled from disk and link bandwidth.

Single-process, single-data-shard use (the mesh may still have a model
axis); multi-host runs keep the streaming loader, whose per-host sharding
replaces DistributedSampler.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmfn_tpu.data.batch import Batch
from mmfn_tpu.data.collate import collate_samples
from mmfn_tpu.ops.lidar import HIST_MAX_PER_PIXEL
from mmfn_tpu.ops.radar import radar_adjacency


def estimate_cache_bytes(n_samples: int, max_lanes: int,
                         resolution: int = 256,
                         need_map: bool = True) -> int:
    """Transport-dtype footprint of ``n_samples`` cached frames (uint8
    rasters + f32 tensors), for the auto-enable gate. ``need_map=False``
    drops the birdview raster plane (only the img variant consumes
    ``Batch.map_img``) — 3 of the 8 uint8 planes, ~37% of the footprint."""
    per = (resolution * resolution * 3          # image u8
           + resolution * resolution * 2        # bev counts u8
           + (resolution * resolution * 3 if need_map else 0)  # map u8
           + max_lanes * 10 * 5 * 4             # lanes f32
           + 81 * 5 * 4                         # radar f32
           + (4 * 2 + 2 + 1 + 3 + 1 + 1) * 4)  # labels/scalars
    return n_samples * per


class DeviceDataset:
    """Uploads a PreprocessedDataset once; serves shuffled device batches.

    ``batches(batch_size, shuffle, seed)`` yields device-resident
    :class:`Batch` objects produced by one jitted gather+cast program —
    numerically identical to the streaming loader's batches (the uint8
    transport is bit-exact for its sources; radar_adj is recomputed on
    device exactly like collate does on host).
    """

    def __init__(self, dataset, max_lanes: int, chunk: int = 256,
                 progress: bool = False, need_map: bool = True):
        # need_map=False: don't stage/upload the birdview raster column —
        # only the img variant reads Batch.map_img, and the column is 37% of
        # the cache footprint (estimate_cache_bytes)
        self.n = len(dataset)
        self.max_lanes = max_lanes
        cols = {k: [] for k in ("image", "bev", "map", "lanes", "lane_num",
                                "radar", "target_point", "velocity",
                                "waypoints", "command", "action")}
        for lo in range(0, self.n, chunk):
            b = collate_samples([dataset[i] for i in
                                 range(lo, min(lo + chunk, self.n))],
                                max_lanes)
            cols["image"].append(np.asarray(b.image, np.uint8))
            cols["bev"].append(np.rint(np.asarray(b.lidar_bev)
                                       * HIST_MAX_PER_PIXEL).astype(np.uint8))
            cols["map"].append(np.asarray(b.map_img, np.uint8)
                               if need_map and b.map_img is not None
                               else None)
            cols["lanes"].append(np.asarray(b.lanes, np.float32))
            cols["lane_num"].append(np.asarray(b.lane_num, np.int32))
            cols["radar"].append(np.asarray(b.radar, np.float32))
            cols["target_point"].append(np.asarray(b.target_point, np.float32))
            cols["velocity"].append(np.asarray(b.velocity, np.float32))
            cols["waypoints"].append(np.asarray(b.waypoints, np.float32))
            cols["command"].append(np.asarray(b.command, np.int32)
                                   if b.command is not None else None)
            cols["action"].append(np.asarray(b.action, np.float32)
                                  if b.action is not None else None)
            if progress:
                print(f"device cache: {min(lo + chunk, self.n)}/{self.n} "
                      f"samples staged", flush=True)

        def put(parts):
            if any(p is None for p in parts):
                return None
            return jax.device_put(np.concatenate(parts))

        self._cols = {k: put(v) for k, v in cols.items()}
        self._gather = jax.jit(self._gather_fn)

    @property
    def nbytes(self) -> int:
        return sum(int(c.nbytes) for c in self._cols.values()
                   if c is not None)

    @staticmethod
    def _gather_fn(cols, idx):
        radar = cols["radar"][idx]
        return Batch(
            image=cols["image"][idx].astype(jnp.float32),
            lidar_bev=cols["bev"][idx].astype(jnp.float32) / HIST_MAX_PER_PIXEL,
            map_img=(None if cols["map"] is None
                     else cols["map"][idx].astype(jnp.float32)),
            lanes=cols["lanes"][idx],
            lane_num=cols["lane_num"][idx],
            radar=radar,
            radar_adj=radar_adjacency(radar),
            target_point=cols["target_point"][idx],
            velocity=cols["velocity"][idx],
            waypoints=cols["waypoints"][idx],
            command=None if cols["command"] is None else cols["command"][idx],
            action=None if cols["action"] is None else cols["action"][idx],
        )

    def batches(self, batch_size: int, *, shuffle: bool = False, seed: int = 0,
                drop_last: bool = True) -> Iterator[Batch]:
        order = (np.random.default_rng(seed).permutation(self.n)
                 if shuffle else np.arange(self.n))
        stop = self.n - batch_size + 1 if drop_last else self.n
        for lo in range(0, max(stop, 0), batch_size):
            idx = order[lo:lo + batch_size].astype(np.int32)
            if len(idx) < batch_size and drop_last:
                break
            yield self._gather(self._cols, idx)


def maybe_device_cache(train_set, val_set, gconf, mode: str,
                       mesh_size: int,
                       budget_bytes: int = 8 << 30,
                       need_map: bool = True) -> Optional[tuple]:
    """phase2's gate: (train_cache, val_cache) when the cached path applies,
    else None. ``mode``: "auto" | True | False. The cache commits its
    columns to the single default device, so it needs a trivial mesh (the
    1-real-chip case this host serves); "auto" also requires the footprint
    to fit the HBM budget. ``need_map=False`` (vec/rad/baselines — anything
    that never reads ``Batch.map_img``) cuts the footprint ~37%."""
    enabled = mode if isinstance(mode, bool) else None
    if enabled is False:
        return None
    single = jax.process_count() == 1 and mesh_size == 1
    est = estimate_cache_bytes(len(train_set) + len(val_set), gconf.max_lanes,
                               need_map=need_map)
    if enabled is None:
        if not single or est > budget_bytes:
            return None
    elif not single:
        raise ValueError("device_data_cache=true needs a single-process, "
                         "single-device run (got "
                         f"{jax.process_count()} processes, mesh size "
                         f"{mesh_size})")
    return (DeviceDataset(train_set, gconf.max_lanes, progress=True,
                          need_map=need_map),
            DeviceDataset(val_set, gconf.max_lanes, need_map=need_map))
