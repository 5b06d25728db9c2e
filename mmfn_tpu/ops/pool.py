"""Adaptive average pooling (NHWC).

The reference pools every fusion stage's feature map to 8x8 anchors with
``nn.AdaptiveAvgPool2d`` (model_img.py:258,352-404). All MMFN feature maps have
side lengths divisible by the target (64/32/16/8 -> 8), so adaptive pooling
reduces to an exact block mean, which XLA fuses into a single reshape+reduce.
The general (non-divisible) case is also provided for the model zoo.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """NHWC adaptive average pool to (out_h, out_w), torch-equivalent."""
    out_h, out_w = out_hw
    b, h, w, c = x.shape
    if h % out_h == 0 and w % out_w == 0:
        x = x.reshape(b, out_h, h // out_h, out_w, w // out_w, c)
        return x.mean(axis=(2, 4))
    # General case: torch AdaptiveAvgPool2d averages over
    # [floor(i*h/oh), ceil((i+1)*h/oh)) — realized as two pooling matmuls.
    def pool_matrix(size: int, out: int) -> jnp.ndarray:
        m = np.zeros((out, size), dtype=np.float32)
        for i in range(out):
            lo = int(np.floor(i * size / out))
            hi = int(np.ceil((i + 1) * size / out))
            m[i, lo:hi] = 1.0 / (hi - lo)
        return jnp.asarray(m, dtype=jnp.float32)

    mh = pool_matrix(h, out_h).astype(x.dtype)
    mw = pool_matrix(w, out_w).astype(x.dtype)
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("Hh,bhwc->bHwc", mh, x, precision=hi)
    return jnp.einsum("Ww,bhwc->bhWc", mw, x, precision=hi)
