"""AOT model export for production serving (jax.export / StableHLO).

The reference "deploys" by constructing the torch module inside the CARLA
agent process and loading a pickle (mmfn_vectornet.py:117-129 setup); a TPU
serving stack ships a compiler-level artifact instead: ``jax.export``
serializes the jitted sensor->waypoints forward — StableHLO plus the calling
convention — so a server can execute the model without the framework's
Python model code (only jax + this Batch pytree registration). Properties:

- **weights stay external**: the artifact is a function of
  ``(variables, batch)``, so checkpoints rotate without re-exporting and the
  artifact stays ~HLO-sized (no 50 M baked-in constants);
- **batch-polymorphic**: the leading batch dimension is exported as a
  symbolic size, one artifact serves any batch (the serving tier picks its
  batching dynamically);
- **multi-platform**: one artifact can carry lowerings for several backends
  (e.g. ``("tpu", "cpu")``) — lowering needs no device, so a CPU CI host can
  produce TPU serving artifacts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
from jax import export as jexport

from mmfn_tpu.data.batch import Batch

_registered = False


def _register_pytrees() -> None:
    """Register the Batch namedtuple for jax.export serialization
    (idempotent; required before serialize/deserialize)."""
    global _registered
    if _registered:
        return
    jexport.register_namedtuple_serialization(
        Batch, serialized_name="mmfn_tpu.data.batch.Batch")
    _registered = True


def _batch_specs(batch: Batch, symbolic_batch: bool):
    """Shape/dtype specs for a Batch, leading dim replaced by a symbolic
    size when requested (one artifact, any serving batch)."""
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = None

    def spec(x):
        if x is None:
            return None
        shape = (b, *x.shape[1:]) if symbolic_batch else x.shape
        return jax.ShapeDtypeStruct(shape, x.dtype)

    return jax.tree.map(spec, batch)


def export_forward(model, variables, sample_batch: Batch,
                   platforms: Optional[Sequence[str]] = None,
                   symbolic_batch: bool = True) -> jexport.Exported:
    """Export the inference forward ``(variables, batch) -> waypoints``.

    ``sample_batch`` fixes every shape except (optionally) the leading batch
    dimension. ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` to embed several lowerings.
    """
    _register_pytrees()
    from mmfn_tpu.train.engine import _model_args

    def forward(variables, batch):
        # _model_args handles the CILRS signature (explicit command arg)
        return model.apply(variables, *_model_args(model, batch, False))

    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables)
    return jexport.export(
        jax.jit(forward),
        platforms=tuple(platforms) if platforms else None,
    )(var_specs, _batch_specs(sample_batch, symbolic_batch))


def save_exported(exported: jexport.Exported, path: str) -> None:
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_exported(path: str) -> jexport.Exported:
    _register_pytrees()
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def serving_call(exported: jexport.Exported):
    """A jittable ``(variables, batch) -> waypoints`` from a loaded artifact
    (``Exported.call`` re-traces per call site; wrap in jax.jit once)."""
    return jax.jit(exported.call)
