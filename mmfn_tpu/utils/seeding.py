"""Global seeding, the `init_torch` analog (run_steps/utils.py:77-84).

The reference seeds python/numpy/torch(+cuda) to 42 before training. In JAX
randomness is explicit (PRNGKeys thread through every stochastic op), so most
determinism is by construction; this seeds the remaining ambient generators
(python `random`, legacy `numpy.random`) and hands back the root PRNGKey.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 42):
    """Seed ambient RNGs and return the jax root key for explicit use."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    import jax

    return jax.random.PRNGKey(seed)
