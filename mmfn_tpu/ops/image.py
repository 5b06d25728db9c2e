"""Camera image preprocessing.

Reference semantics (team_code/mmfn_utils/datasets/dataloader.py:296-308 and
models/model_img.py:33-44):

- ``scale_and_crop_image``: integer-scale resize then a center crop whose row
  offset is computed from the *height* and column offset from the *width*
  (the reference swaps the names ``start_x``/``start_y``; behavior preserved).
  Output is uint8 HWC here (the reference returns CHW; we are NHWC-native).
- ``normalize_imagenet``: the network consumes raw 0-255 pixel values pushed
  through (x - mean)/std with the standard ImageNet 0-1 constants. This is a
  deliberate quirk inherited from the TransFuser lineage — images are NOT
  divided by 255 anywhere (see reference phase2_train_net.py:80, which casts
  the uint8 tensor straight to float). We preserve it for checkpoint parity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def scale_and_crop_image(image: np.ndarray, scale: int = 1, crop: int = 256) -> np.ndarray:
    """Downscale by an integer factor and center-crop.

    Args:
        image: HWC uint8 array (any channel count; RGB expected).
        scale: integer downscale factor (PIL default resample — bicubic for
            RGB — exactly as the reference's ``image.resize((w, h))``).
        crop: output side length.

    Returns:
        (crop, crop, C) uint8 array, channels-last.
    """
    image = np.asarray(image)
    h, w = image.shape[:2]
    if scale != 1:
        from PIL import Image  # host-side path; match the reference exactly

        new_w, new_h = int(w // scale), int(h // scale)
        image = np.asarray(Image.fromarray(
            np.ascontiguousarray(image)).resize((new_w, new_h)))
        h, w = new_h, new_w
    row0 = h // 2 - crop // 2
    col0 = w // 2 - crop // 2
    return image[row0:row0 + crop, col0:col0 + crop]


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-standard per-channel affine on an NHWC tensor.

    Note: callers feed raw 0-255 floats (reference quirk — see module docstring).
    """
    mean = jnp.asarray(_IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(_IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std
