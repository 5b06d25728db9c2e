"""Model registry — the TPU equivalent of the reference's hydra entry points.

The reference selects a model with ``train_agent.entry_point`` strings like
``mmfn_utils.models.model_vec:MMFN`` resolved by ``load_entry_point``
(run_steps/utils.py:68-72). We accept both our short names and the reference's
entry-point strings (mapped onto the matching variant) so configs port over.
"""

from __future__ import annotations

import importlib
from typing import Callable

from mmfn_tpu.config import GlobalConfig

MODEL_REGISTRY = {}


def register(name: str) -> Callable:
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


def _mmfn_factory(variant: str):
    def build(config: GlobalConfig):
        from mmfn_tpu.models.mmfn import build_model
        return build_model(config, variant)
    return build


for _variant in ("img", "vec", "rad"):
    MODEL_REGISTRY[f"mmfn_{_variant}"] = _mmfn_factory(_variant)
    # reference-style entry points
    MODEL_REGISTRY[f"mmfn_utils.models.model_{_variant}:MMFN"] = _mmfn_factory(_variant)


def _baseline_factory(name: str):
    def build(config: GlobalConfig):
        from mmfn_tpu.models import baselines

        return {"aim": baselines.AIM, "cilrs": baselines.CILRS,
                "transfuser": baselines.TransFuser}[name](config=config)
    return build


for _name in ("aim", "cilrs", "transfuser"):
    MODEL_REGISTRY[_name] = _baseline_factory(_name)


def get_entry_point(name: str):
    """Resolve a model factory by registry name or ``module:attr`` path."""
    if name in MODEL_REGISTRY:
        return MODEL_REGISTRY[name]
    if ":" in name:
        module, attr = name.split(":")
        return getattr(importlib.import_module(module), attr)
    raise KeyError(f"unknown model entry point: {name!r}; known: {sorted(MODEL_REGISTRY)}")
