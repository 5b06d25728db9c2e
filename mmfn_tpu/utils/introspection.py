"""Model introspection: attention maps and intermediate activations.

The reference ships TransFuser's attention-visualization tooling
(team_code/benchmarks/transfuser/{model_viz,viz}.py). flax makes this generic:
``capture_intermediates`` records every submodule output, so any fusion
stage's attention pattern can be pulled from a normal forward pass without
touching the model code.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def forward_with_intermediates(model, variables, batch,
                               filter_fn=None) -> Tuple[jnp.ndarray, Dict]:
    """Run a forward pass capturing intermediate activations.

    filter_fn(module, name) -> bool selects what to record (default: module
    outputs of every fusion block's attention)."""
    if filter_fn is None:
        def filter_fn(mdl, method_name):
            return type(mdl).__name__ in ("SelfAttention", "FusionTransformer")

    # one jitted program: through async/relay runtimes an op-by-op capture
    # forward costs thousands of dispatches; the captured pytree jits fine
    @jax.jit
    def run(variables, batch):
        return model.apply(variables, batch, False,
                           capture_intermediates=filter_fn)

    out, state = run(variables, batch)
    return out, state.get("intermediates", {})


def attention_rollout(intermediates: Dict, transformer: str = "transformer4"
                      ) -> np.ndarray:
    """Average the captured attention-layer outputs of one fusion stage into a
    (T, C) token map for visualization. Returns an empty array when the stage
    was not captured."""
    stage = intermediates.get("encoder", {}).get(transformer, {})
    outputs = []

    def collect(node):
        if isinstance(node, dict):
            for v in node.values():
                collect(v)
        elif isinstance(node, tuple):
            for v in node:
                collect(v)
        else:
            arr = np.asarray(node)
            if arr.ndim == 3:  # (B, T, C) attention block output
                outputs.append(arr)

    collect(stage)
    if not outputs:
        return np.zeros((0, 0))
    return np.mean([o.mean(axis=0) for o in outputs], axis=0)


def attention_weights(intermediates: Dict) -> Dict[str, np.ndarray]:
    """Collect the softmax attention maps sown by every SelfAttention
    (gpt.py), keyed by their module path. Each value is (B, heads, T, T)."""
    maps: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, (tuple, list)):
            for v in node:
                walk(v, path)
        else:
            arr = np.asarray(node)
            if path and path[-1] == "attention_weights" and arr.ndim == 4:
                maps["/".join(path[:-1])] = arr

    walk(intermediates, ())
    return maps


def token_attention_image(att: np.ndarray, query_group: int, key_group: int,
                          grid: int = 8) -> np.ndarray:
    """Average one stage's (B, H, T, T) attention into a (grid*grid,) map of
    how much modality ``query_group``'s tokens attend to each spatial token of
    modality ``key_group``, reshaped to (grid, grid). Token layout is
    n_groups x grid^2 (gpt.py: per-modality 8x8 grids concatenated)."""
    n = grid * grid
    sub = att.mean(axis=(0, 1))          # (T, T) averaged over batch + heads
    q0, k0 = query_group * n, key_group * n
    block = sub[q0:q0 + n, k0:k0 + n]    # queries x keys
    return block.mean(axis=0).reshape(grid, grid)
