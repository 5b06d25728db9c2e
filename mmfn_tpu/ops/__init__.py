"""Sensor preprocessing ops.

Each op exists in two forms:
- a pure-numpy host implementation (the *oracle*) matching the reference's
  semantics bit-for-bit, used by the dataset pipeline and by golden tests;
- a jit-compilable JAX implementation with static shapes designed for the MXU
  (e.g. the LiDAR BEV histogram is a one-hot matmul, not a scatter).
"""

from mmfn_tpu.ops.image import normalize_imagenet, scale_and_crop_image  # noqa: F401
from mmfn_tpu.ops.lidar import (  # noqa: F401
    lidar_to_histogram_features_np,
    lidar_to_histogram_features,
    transform_2d_points_np,
    transform_2d_points,
)
from mmfn_tpu.ops.radar import radar_to_size_np, radar_adjacency_np, radar_adjacency  # noqa: F401
from mmfn_tpu.ops.resize import upsample_bilinear_align_corners  # noqa: F401
from mmfn_tpu.ops.pool import adaptive_avg_pool  # noqa: F401
