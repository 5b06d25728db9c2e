"""Bilinear upsampling with ``align_corners=True`` semantics.

The reference upsamples the 8x8 fused token grids back to the CNN feature-map
resolution with ``F.interpolate(..., mode='bilinear', align_corners=True)``
(model_img.py:356-392). ``jax.image.resize`` implements only half-pixel
(align_corners=False) sampling, so we build the 1-D interpolation matrices
explicitly and apply them as two matmuls — exact, differentiable, and
MXU-friendly (the matrices are compile-time constants).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix M with out = M @ in, align_corners=True bilinear."""
    m = np.zeros((dst, src), dtype=np.float32)
    if src == 1:
        m[:, 0] = 1.0
        return m
    if dst == 1:
        # align_corners maps the single output to source pixel 0 (torch
        # semantics); the general formula would divide by dst-1 == 0
        m[0, 0] = 1.0
        return m
    coords = np.arange(dst) * (src - 1) / (dst - 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    frac = (coords - lo).astype(np.float32)
    m[np.arange(dst), lo] += 1.0 - frac
    m[np.arange(dst), hi] += frac
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC bilinear resize to (out_h, out_w), align_corners=True (up or down)."""
    _, h, w, _ = x.shape
    out_h, out_w = out_hw
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_interp_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w, out_w), dtype=x.dtype)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("Hh,bhwc->bHwc", mh, x, precision=hi)
    return jnp.einsum("Ww,bhwc->bhWc", mw, x, precision=hi)


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC bilinear upsample by an integer factor, align_corners=True."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, (h * scale, w * scale))
