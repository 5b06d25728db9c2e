"""VectorNet-style lane encoder (reference model_vec.py:248-416).

Lanes arrive as a statically padded (B, MAX_LANES, 10, 5) tensor + per-sample
lane counts. The reference pads ragged lane lists per batch with pad_sequence;
here MAX_LANES is a compile-time constant so the whole model jits once — the
lane-count mask reproduces the reference's masked global attention exactly
(padded lanes never influence token 0, which is the only token consumed).

Pipeline: per-lane polyline "subgraph" (3x MLP + max-pool concat), masked
global self-attention over lanes, a constant positional embedding (the
reference feeds zeros to its pos-emb MLP — preserved), an agent-fusion MLP,
and a generator that expands lane token 0 into a 64x64x64 spatial feature map
consumed as the map stream of the fusion transformer.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mmfn_tpu.models.common import torch_linear_kernel_init, torch_linear_bias_init


class MLP(nn.Module):
    """Dense + LayerNorm + ReLU (reference model_vec.py:248-257)."""

    features: int
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(x.shape[-1]),
                     precision=self.precision)(x)
        return nn.relu(nn.LayerNorm(epsilon=1e-5)(x))


class Subgraph(nn.Module):
    """Polyline encoder: num_layers x (MLP -> concat max-pool), final max-pool.

    (B, L, V, d_in) -> (B, L, 2*features).
    """

    features: int
    num_layers: int = 3
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = MLP(self.features, precision=self.precision, name=f"mlp_{i}")(x)
            pooled = jnp.max(x, axis=-2, keepdims=True)
            x = jnp.concatenate([x, jnp.broadcast_to(pooled, x.shape)], axis=-1)
        return jnp.max(x, axis=-2)


class MaskSelfAttention(nn.Module):
    """Multi-head self-attention with a key mask (reference model_vec.py:284-324)."""

    dim: int
    heads: int = 1
    dropout: float = 0.0
    precision: Any = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b, n, _ = x.shape
        dim_head = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, use_bias=False,
                       kernel_init=torch_linear_kernel_init,
                       precision=self.precision, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, self.heads, dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        dots = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=self.precision) * (dim_head ** -0.5)
        if mask is not None:
            # mask: (B, 1, N) -> broadcast over heads and queries, zero = ignore key
            dots = jnp.where(mask[:, None, :, :] == 0, -1e9, dots)
        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=self.precision)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, kernel_init=torch_linear_kernel_init,
                       bias_init=torch_linear_bias_init(self.dim),
                       precision=self.precision, name="to_out")(out)
        return nn.Dropout(self.dropout)(out, deterministic=not train), attn


class VectornetEncoder(nn.Module):
    lane_channels: int = 7
    hidden_size: int = 64
    subgraph_layers: int = 3
    pos_dim: int = 64
    heads: int = 2
    fusion_dim: int = 128
    out_hw: int = 64     # generator expands to (out_hw, out_hw, out_channels)
    out_channels: int = 64
    precision: Any = None

    def setup(self):
        kw = dict(kernel_init=torch_linear_kernel_init, precision=self.precision)
        self.lane_subgraph = Subgraph(self.hidden_size, self.subgraph_layers,
                                      precision=self.precision)
        self.pos_fc1 = nn.Dense(self.pos_dim, bias_init=torch_linear_bias_init(2), **kw)
        self.pos_ln = nn.LayerNorm(epsilon=1e-5)
        self.pos_fc2 = nn.Dense(self.pos_dim, bias_init=torch_linear_bias_init(self.pos_dim), **kw)
        self.L2L = MaskSelfAttention(self.hidden_size * 2, self.heads, precision=self.precision)
        d_cat = self.pos_dim + self.hidden_size * 2
        self.fuse_fc1 = nn.Dense(self.fusion_dim, bias_init=torch_linear_bias_init(d_cat), **kw)
        self.fuse_ln = nn.LayerNorm(epsilon=1e-5)
        self.fuse_fc2 = nn.Dense(self.hidden_size * 2,
                                 bias_init=torch_linear_bias_init(self.fusion_dim), **kw)
        self.gen_fc1 = nn.Dense(self.hidden_size,
                                bias_init=torch_linear_bias_init(self.hidden_size * 2), **kw)
        self.gen_ln = nn.LayerNorm(epsilon=1e-5)
        self.gen_fc2 = nn.Dense(self.out_hw * self.out_hw * self.out_channels,
                                bias_init=torch_linear_bias_init(self.hidden_size), **kw)

    def _lane_to_vector(self, lanes: jnp.ndarray) -> jnp.ndarray:
        """(B, L, 10, 5) -> (B, L, 9, 7): [start_xy, end_xy, end_attrs]."""
        return jnp.concatenate(
            [lanes[:, :, :-1, 0:2], lanes[:, :, 1:, 0:2], lanes[:, :, 1:, 2:]], axis=-1)

    def __call__(self, lanes: jnp.ndarray, lane_num: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """lanes (B, L, 10, 5) float, lane_num (B,) int -> (B, 64, 64, 64) NHWC."""
        b, max_lanes = lanes.shape[0], lanes.shape[1]
        lane_token = self.lane_subgraph(self._lane_to_vector(lanes))   # (B, L, 128)

        lane_ids = jnp.arange(max_lanes)[None, :]
        mask = (lane_ids < lane_num[:, None]).astype(lane_token.dtype)[:, None, :]  # (B,1,L)
        lane_token, _ = self.L2L(lane_token, mask, train)

        # Reference quirk preserved: the positional embedding MLP consumes zeros,
        # yielding one constant vector per token (model_vec.py:408).
        zeros = jnp.zeros((b, max_lanes, 2), dtype=lane_token.dtype)
        pos = self.pos_fc2(nn.gelu(self.pos_ln(self.pos_fc1(zeros)), approximate=False))

        fused = jnp.concatenate([lane_token, pos], axis=-1)
        fused = self.fuse_fc2(nn.gelu(self.fuse_ln(self.fuse_fc1(fused)), approximate=False))

        # Only lane token 0 seeds the map stream (reference model_vec.py:412).
        agent = fused[:, 0, :]
        out = self.gen_fc2(nn.gelu(self.gen_ln(self.gen_fc1(agent)), approximate=False))
        # reference: rearrange "b (c h w) -> b c h w" (NCHW); we emit NHWC.
        out = out.reshape(b, self.out_channels, self.out_hw, self.out_hw)
        return out.transpose(0, 2, 3, 1)
