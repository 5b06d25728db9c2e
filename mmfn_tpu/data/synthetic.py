"""Deterministic synthetic batches for tests and benchmarks (no CARLA needed)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mmfn_tpu.data.batch import Batch


def synthetic_batch(batch_size: int = 2, max_lanes: int = 64, seed: int = 0,
                    resolution: int = 256) -> Batch:
    rng = np.random.default_rng(seed)
    r = resolution
    lanes = rng.normal(size=(batch_size, max_lanes, 10, 5)).astype(np.float32) * 10
    lanes[..., 2:] = rng.integers(0, 2, size=lanes[..., 2:].shape)
    lane_num = rng.integers(1, max_lanes + 1, size=(batch_size,))
    radar = rng.normal(size=(batch_size, 81, 5)).astype(np.float32)
    adj = radar[:, None, :, 1] - radar[:, :, None, 1]
    return Batch(
        image=jnp.asarray(rng.integers(0, 256, size=(batch_size, r, r, 3)).astype(np.float32)),
        lidar_bev=jnp.asarray(rng.integers(0, 6, size=(batch_size, r, r, 2)).astype(np.float32) / 5.0),
        map_img=jnp.asarray(rng.integers(0, 256, size=(batch_size, r, r, 3)).astype(np.float32)),
        lanes=jnp.asarray(lanes),
        lane_num=jnp.asarray(lane_num, dtype=jnp.int32),
        radar=jnp.asarray(radar),
        radar_adj=jnp.asarray(adj.astype(np.float32)),
        target_point=jnp.asarray(rng.normal(size=(batch_size, 2)).astype(np.float32) * 5),
        velocity=jnp.asarray(np.abs(rng.normal(size=(batch_size,))).astype(np.float32) * 5),
        waypoints=jnp.asarray(rng.normal(size=(batch_size, 4, 2)).astype(np.float32)),
        command=jnp.asarray(rng.integers(1, 7, size=(batch_size,)), dtype=jnp.int32),
        action=jnp.asarray(
            rng.uniform(0, 1, size=(batch_size, 3)).astype(np.float32)),
    )
