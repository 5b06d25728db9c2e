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

    out, state = model.apply(variables, batch, False,
                             capture_intermediates=filter_fn)
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
