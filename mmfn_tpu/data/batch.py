"""The canonical training/inference batch — a static-shape pytree.

Field semantics mirror the reference dataloader's __getitem__ output
(dataloader.py:183-268) with the TPU-native changes:
- NHWC image layouts;
- the ragged lane list is padded to (B, MAX_LANES, 10, 5) with a lane_num mask
  (the reference pads per-batch with pad_sequence; semantics equivalent);
- images are raw 0-255 floats (the network applies the ImageNet affine).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class Batch(NamedTuple):
    image: jnp.ndarray                 # (B, 256, 256, 3) float, raw 0-255
    lidar_bev: jnp.ndarray             # (B, 256, 256, 2) float
    target_point: jnp.ndarray          # (B, 2)
    velocity: jnp.ndarray              # (B,)
    map_img: Optional[jnp.ndarray] = None      # (B, 256, 256, 3) rasterized HD-map
    lanes: Optional[jnp.ndarray] = None        # (B, L, 10, 5) vectorized lanes
    lane_num: Optional[jnp.ndarray] = None     # (B,) valid-lane counts
    radar: Optional[jnp.ndarray] = None        # (B, 81, 5)
    radar_adj: Optional[jnp.ndarray] = None    # (B, 81, 81)
    waypoints: Optional[jnp.ndarray] = None    # (B, 4, 2) ground-truth labels
    command: Optional[jnp.ndarray] = None      # (B,) navigational command (1-based)
    action: Optional[jnp.ndarray] = None       # (B, 3) expert steer/throttle/brake
