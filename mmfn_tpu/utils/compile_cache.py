"""Persistent XLA compile cache for the TPU entry points.

The full MMFN train/inference graphs take minutes to compile cold; every CLI
that jits them enables this cache so re-runs (and checkpoint resumes) start
warm. TPU backend only: reloading cached XLA:CPU executables can hard-abort
on host-ISA drift (see CLAUDE.md) — the CPU test lane manages its own pinned
cache in tests/conftest.py instead.
"""

from __future__ import annotations

import os

import jax


def enable_persistent_cache(path: str = "~/.cache/mmfn_tpu_xla") -> bool:
    """Point jax's compilation cache at ``path`` (TPU backend only).

    Returns True when enabled. Safe to call more than once.
    """
    if jax.default_backend() != "tpu":
        return False
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
