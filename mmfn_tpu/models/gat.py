"""Radar graph-attention encoder (reference model_rad.py:742-884, pyGAT lineage).

The reference ships a "sparse" GAT whose batched path is already dense masked
attention (model_rad.py:812-824); with 81 radar nodes, sparsity buys nothing on
a TPU, so this is implemented directly as dense masked attention — identical
math, MXU-shaped.

Shape walk (parity-critical, the reference graph is unusual):
  x (B, 81, 5) -> per head: Wh = x @ W (B, 81, 162); e = leaky_relu(Wh @ a)
  (B, 81, 81); attn = softmax(where(adj > 0, e, -9e15)); h' = elu(attn @ Wh).
  Heads are concatenated along the NODE axis -> (B, 162, 162); then
  mlp_1: 162 -> 256 on the last axis, transpose, mlp_2: 162 -> 128,
  reshape (B, 8, 8, 512) [torch: .view(B,8,8,512).transpose(1,3) -> NCHW],
  log_softmax over channels. We return the NHWC equivalent.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mmfn_tpu.models.common import xavier_normal_gain, torch_linear_kernel_init, torch_linear_bias_init


class GraphAttentionLayer(nn.Module):
    in_features: int
    out_features: int
    dropout: float
    alpha: float
    precision: Any = None

    @nn.compact
    def __call__(self, h, adj, train: bool = False):
        w = self.param("W", xavier_normal_gain(1.414),
                       (self.in_features, 2 * self.out_features))
        a = self.param("a", xavier_normal_gain(1.414),
                       (2 * self.out_features, self.out_features))
        wh = jnp.einsum("bnf,fe->bne", h, w, precision=self.precision)       # (B, N, 2*out)
        e = nn.leaky_relu(jnp.einsum("bne,eo->bno", wh, a, precision=self.precision),
                          negative_slope=self.alpha)                          # (B, N, N)
        attention = jnp.where(adj > 0, e, -9e15)
        attention = nn.softmax(attention, axis=-1)
        attention = nn.Dropout(self.dropout)(attention, deterministic=not train)
        h_prime = jnp.einsum("bnm,bme->bne", attention, wh, precision=self.precision)
        return nn.elu(h_prime)


class RadarGAT(nn.Module):
    """SpGAT-equivalent: (B, 81, 5) radar + (B, 81, 81) adj -> (B, 8, 8, 512)."""

    nfeat: int = 5
    nhid: int = 81
    dropout: float = 0.1
    alpha: float = 0.2
    nheads: int = 2
    precision: Any = None

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        heads = [
            GraphAttentionLayer(self.nfeat, self.nhid, self.dropout, self.alpha,
                                precision=self.precision, name=f"attention_{i}")(x, adj, train)
            for i in range(self.nheads)
        ]
        x = jnp.concatenate(heads, axis=1)          # cat along NODE axis (reference quirk)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(256, kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(x.shape[-1]),
                     precision=self.precision, name="mlp_1")(nn.elu(x))
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = x.transpose(0, 2, 1)                    # (B, 256, 2*nhid)
        x = nn.Dense(128, kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(x.shape[-1]),
                     precision=self.precision, name="mlp_2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        # torch: view(B, 8, 8, 512).transpose(1, 3) -> (B, 512, 8, 8) NCHW.
        # NHWC equivalent of that tensor is view(B,8,8,512).transpose(0,2,1,3).
        x = x.reshape(x.shape[0], 8, 8, 512).transpose(0, 2, 1, 3)
        return nn.log_softmax(x, axis=-1)           # channels axis in NHWC
