"""Radar preprocessing.

Reference semantics:
- ``radar_to_size`` (dataloader.py:336-346): fit a variable-length radar return
  set to exactly 81 rows. Rows are [velocity, altitude, azimuth, depth]
  (+ a 5th sensor-tag column appended by the agent). When there are more than
  81 returns, the surplus rows with the LARGEST |velocity/depth| (i.e. the
  smallest time-to-collision) are deleted, preserving the original order of
  the survivors; when fewer, zero-pad at the end.
- ``radar_adjacency`` (dataloader.py:376-385): dense 81x81 matrix
  adj[i, j] = alt[j] - alt[i] built from column 1. The GAT masks attention to
  entries > 0, so this acts as a directed altitude-ordering graph.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def radar_to_size_np(data: np.ndarray, target_size=(81, 5)) -> np.ndarray:
    """Numpy oracle, exact reference behavior including row ordering."""
    data = np.asarray(data)
    out = np.zeros(target_size)
    if data.shape[0] >= target_size[0]:
        n_extra = data.shape[0] - target_size[0]
        # indices of the n_extra rows with largest |v/d|, deleted from data
        order = (-np.abs(data[:, 0] / data[:, 3])).argsort()
        out = np.delete(data, order[:n_extra], 0)
    else:
        out[:data.shape[0], :] = data
    return out


def radar_adjacency_np(radar: np.ndarray) -> np.ndarray:
    """adj[i, j] = radar[j, 1] - radar[i, 1] over the 81 fitted rows."""
    alt = np.asarray(radar)[:, 1]
    return (alt[None, :] - alt[:, None]).astype(np.float32)


def radar_adjacency(radar: jnp.ndarray) -> jnp.ndarray:
    """JAX version; radar (..., N, F) -> (..., N, N)."""
    alt = radar[..., 1]
    return alt[..., None, :] - alt[..., :, None]
