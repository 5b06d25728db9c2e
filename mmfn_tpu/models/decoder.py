"""Autoregressive GRU waypoint decoder (reference model_img.py:475-507).

The GRU cell reproduces torch.nn.GRUCell's exact gate math (two separate bias
vectors; reset gate applied to the *hidden* candidate projection) so converted
checkpoints are numerically faithful — flax's GRUCell differs in bias layout.
pred_len is static (4), so the loop is unrolled at trace time; XLA fuses the
four tiny (B,2)x(2,192) steps into one program.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gru_uniform(hidden_size: int):
    bound = 1.0 / jnp.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchGRUCell(nn.Module):
    """torch.nn.GRUCell parity: gates ordered [r, z, n]; h' = (1-z)*n + z*h."""

    input_size: int
    hidden_size: int
    precision: Any = None

    @nn.compact
    def __call__(self, x, h):
        init = _gru_uniform(self.hidden_size)
        w_ih = self.param("weight_ih", init, (self.input_size, 3 * self.hidden_size))
        w_hh = self.param("weight_hh", init, (self.hidden_size, 3 * self.hidden_size))
        b_ih = self.param("bias_ih", init, (3 * self.hidden_size,))
        b_hh = self.param("bias_hh", init, (3 * self.hidden_size,))
        gi = jnp.dot(x, w_ih, precision=self.precision) + b_ih
        gh = jnp.dot(h, w_hh, precision=self.precision) + b_hh
        hs = self.hidden_size
        r = nn.sigmoid(gi[..., :hs] + gh[..., :hs])
        z = nn.sigmoid(gi[..., hs:2 * hs] + gh[..., hs:2 * hs])
        n = nn.tanh(gi[..., 2 * hs:] + r * gh[..., 2 * hs:])
        return (1.0 - z) * n + z * h


class WaypointDecoder(nn.Module):
    """z (B, 64) fused feature + target point -> (B, pred_len, 2) waypoints.

    ``input_mode='add'`` feeds x + target_point into the GRU (MMFN/TransFuser,
    model_img.py:497-503); ``'cat'`` concatenates them (AIM, benchmarks
    aim/model.py:92,112). Each step integrates the predicted delta:
    x_{k+1} = x_k + out(h_{k+1}).
    """

    pred_len: int = 4
    hidden_size: int = 64
    input_mode: str = "add"   # 'add' (GRU in=2) | 'cat' (GRU in=4)
    precision: Any = None

    def setup(self):
        in_size = 2 if self.input_mode == "add" else 4
        self.decoder = TorchGRUCell(in_size, self.hidden_size, precision=self.precision)
        self.output = nn.Dense(
            2,
            kernel_init=_gru_uniform(self.hidden_size),
            bias_init=_gru_uniform(self.hidden_size),
            precision=self.precision,
            name="output",
        )

    def __call__(self, z: jnp.ndarray, target_point: jnp.ndarray) -> jnp.ndarray:
        b = z.shape[0]
        x = jnp.zeros((b, 2), dtype=z.dtype)
        h = z
        waypoints = []
        tp = target_point.astype(z.dtype)
        for _ in range(self.pred_len):
            x_in = (x + tp) if self.input_mode == "add" else jnp.concatenate([x, tp], axis=1)
            h = self.decoder(x_in, h)
            x = x + self.output(h)
            waypoints.append(x)
        return jnp.stack(waypoints, axis=1)
