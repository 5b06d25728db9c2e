"""Cross-modal fusion transformer ("GPT" in the reference, model_img.py:73-246).

One module generalizes the reference's GPT (3 modality token groups) and
RadarGPT (4 groups, model_rad.py:887-1000) and the TransFuser baseline's
2-group fusion: each modality contributes an 8x8 token grid; tokens get a
learnable positional embedding plus a velocity embedding broadcast to every
token; n_layer pre-LN blocks with ReLU MLPs; final LayerNorm; tokens are split
back into per-modality grids.

TPU notes: 64*n_groups tokens (<=256) at up to 512 channels — attention here is
tiny; the win is batching all modalities into one attention call so the MXU
sees (B, 256, C) matmuls instead of per-modality fragments.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from mmfn_tpu.models.common import gpt_kernel_init


class SelfAttention(nn.Module):
    n_embd: int
    n_head: int
    attn_pdrop: float
    resid_pdrop: float
    precision: Any = None
    attn_impl: str = "xla"   # "pallas": fused inference kernel (ops/attention.py)

    def setup(self):
        kw = dict(kernel_init=gpt_kernel_init, bias_init=nn.initializers.zeros,
                  precision=self.precision)
        self.key = nn.Dense(self.n_embd, **kw)
        self.query = nn.Dense(self.n_embd, **kw)
        self.value = nn.Dense(self.n_embd, **kw)
        self.proj = nn.Dense(self.n_embd, **kw)
        self.attn_drop = nn.Dropout(self.attn_pdrop)
        self.resid_drop = nn.Dropout(self.resid_pdrop)

    def __call__(self, x, train: bool = False):
        b, t, c = x.shape
        hs = c // self.n_head
        q = self.query(x).reshape(b, t, self.n_head, hs).transpose(0, 2, 1, 3)
        k = self.key(x).reshape(b, t, self.n_head, hs).transpose(0, 2, 1, 3)
        v = self.value(x).reshape(b, t, self.n_head, hs).transpose(0, 2, 1, 3)
        if self.attn_impl == "pallas" and not train:
            # fused on-chip QK^T/softmax/AV (inference only: no dropout is
            # active and the kernel defines no VJP; no weights to sow)
            from mmfn_tpu.ops.attention import fused_attention

            y = fused_attention(q, k, v)
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=self.precision) / jnp.sqrt(hs).astype(x.dtype)
            att = nn.softmax(att, axis=-1)
            # recorded only when "intermediates" is mutable/captured (viz
            # tooling, utils/introspection.py) — free in normal jitted forwards
            self.sow("intermediates", "attention_weights", att)
            att = self.attn_drop(att, deterministic=not train)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v, precision=self.precision)
        y = y.transpose(0, 2, 1, 3).reshape(b, t, c)
        return self.resid_drop(self.proj(y), deterministic=not train)


class Block(nn.Module):
    n_embd: int
    n_head: int
    block_exp: int
    attn_pdrop: float
    resid_pdrop: float
    precision: Any = None
    attn_impl: str = "xla"

    def setup(self):
        kw = dict(kernel_init=gpt_kernel_init, bias_init=nn.initializers.zeros,
                  precision=self.precision)
        self.ln1 = nn.LayerNorm(epsilon=1e-5)
        self.ln2 = nn.LayerNorm(epsilon=1e-5)
        self.attn = SelfAttention(self.n_embd, self.n_head, self.attn_pdrop,
                                  self.resid_pdrop, precision=self.precision,
                                  attn_impl=self.attn_impl)
        self.fc1 = nn.Dense(self.block_exp * self.n_embd, **kw)
        self.fc2 = nn.Dense(self.n_embd, **kw)
        self.mlp_drop = nn.Dropout(self.resid_pdrop)

    def __call__(self, x, train: bool = False):
        x = x + self.attn(self.ln1(x), train)
        h = self.fc2(nn.relu(self.fc1(self.ln2(x))))
        return x + self.mlp_drop(h, deterministic=not train)


class FusionTransformer(nn.Module):
    """Fuse ``n_groups`` 8x8 modality grids; returns updated grids.

    Equivalent to the reference GPT for n_groups=3 and RadarGPT for n_groups=4.
    """

    n_embd: int
    n_head: int
    block_exp: int
    n_layer: int
    n_groups: int
    vert_anchors: int = 8
    horz_anchors: int = 8
    seq_len: int = 1
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    precision: Any = None
    attn_impl: str = "xla"

    def setup(self):
        t = self.n_groups * self.seq_len * self.vert_anchors * self.horz_anchors
        self.pos_emb = self.param("pos_emb", nn.initializers.zeros, (1, t, self.n_embd))
        self.vel_emb = nn.Dense(self.n_embd, kernel_init=gpt_kernel_init,
                                bias_init=nn.initializers.zeros, precision=self.precision)
        self.blocks = tuple(
            Block(self.n_embd, self.n_head, self.block_exp, self.attn_pdrop,
                  self.resid_pdrop, precision=self.precision,
                  attn_impl=self.attn_impl, name=f"block_{i}")
            for i in range(self.n_layer)
        )
        self.ln_f = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.embd_pdrop)

    def __call__(self, grids: List[jnp.ndarray], velocity: jnp.ndarray,
                 train: bool = False) -> List[jnp.ndarray]:
        assert len(grids) == self.n_groups
        b, h, w, c = grids[0].shape
        tokens = jnp.concatenate([g.reshape(b, h * w, c) for g in grids], axis=1)
        vel = self.vel_emb(velocity[:, None].astype(tokens.dtype))  # (B, C)
        x = self.drop(self.pos_emb.astype(tokens.dtype) + tokens + vel[:, None, :],
                      deterministic=not train)
        for block in self.blocks:
            x = block(x, train)
        x = self.ln_f(x)
        return [x[:, i * h * w:(i + 1) * h * w, :].reshape(b, h, w, c)
                for i in range(self.n_groups)]
