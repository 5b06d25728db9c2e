"""Shared building blocks and parity-oriented initializers."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weight,
# uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) on bias. We only need *training*
# parity in distribution, not bit-parity, so we use the same families.


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """kaiming_uniform(a=sqrt(5)) == uniform(+-sqrt(1/fan_in)) for 2D weights.

    flax Dense kernels are (in, out); fan_in = shape[0].
    """
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def gpt_kernel_init(key, shape, dtype=jnp.float32):
    """normal(0, 0.02) — the reference GPT applies this to every Linear
    (model_img.py:170-177)."""
    return jax.random.normal(key, shape, dtype) * 0.02


def xavier_normal_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[-1]
        std = gain * jnp.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, dtype) * std
    return init


def resolve_precision(name: Optional[str]) -> Any:
    if name in (None, "default"):
        return None
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "bfloat16": jax.lax.Precision.DEFAULT,
    }[name]


def join_mlp(precision):
    """The reference's 'join' MLP 512->256->128->64 (model_img.py:469-476),
    shared by MMFN and the AIM/TransFuser baselines."""
    kw = dict(kernel_init=torch_linear_kernel_init, precision=precision)
    return (nn.Dense(256, bias_init=torch_linear_bias_init(512), **kw),
            nn.Dense(128, bias_init=torch_linear_bias_init(256), **kw),
            nn.Dense(64, bias_init=torch_linear_bias_init(128), **kw))


def max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1), NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
