"""Fused multi-head self-attention Pallas kernel (inference path).

The fusion transformer's attention is FULL (no mask) over short sequences —
T = 64 x n_groups tokens (128/192/256) at head dims 16..128
(models/gpt.py:SelfAttention, reference model_img.py:73-246). At these sizes
the whole (T, D) tile set fits VMEM, so one kernel program per (batch, head)
computes QK^T -> row-softmax -> AV entirely on-chip: the (T, T) attention
matrix never materializes in HBM (the XLA path writes + re-reads it unless
fusion wins, and it feeds the probability matrix through an f32
transpose-copy). Same numerics as the einsum path it replaces: stable
softmax (row-max subtraction) and, on TPU, the same single-pass bf16 MXU
multiplies with f32 accumulation that XLA's DEFAULT precision uses for f32
operands (measured: both sit ~5e-3 from a HIGHEST-precision f32 ground
truth and agree with each other to ~2e-4 — bench.py's on-silicon
self-check asserts the latter).

Opt-in via ``GlobalConfig.attn_impl = "pallas"`` (default "xla" preserves the
einsum path and its attention-weights sow for the viz tooling); selected only
for inference (``train=False``) — the kernel defines no VJP and the train
step keeps XLA's fused softmax-dropout. Auto-interprets off-TPU like
ops/lidar.py's BEV kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0, 0].astype(jnp.float32)            # (T, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    att = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    att = att - jnp.max(att, axis=-1, keepdims=True)
    p = jnp.exp(att)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    b, h, t, d = q.shape
    scale = 1.0 / (d ** 0.5)
    spec = pl.BlockSpec((1, 1, t, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b, h),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * t * t * d,             # QK^T + PV per program
            bytes_accessed=4 * t * d * 4,    # q, k, v in + o out (f32)
            transcendentals=t * t,           # exp
        ),
        interpret=interpret,
    )(q, k, v)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d)) v for (B, H, T, D) tensors, one fused
    on-chip program per (batch, head). Interpreted off-TPU."""
    return _fused_attention(q, k, v,
                            interpret=jax.default_backend() != "tpu")
