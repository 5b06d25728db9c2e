"""AOT serving export (mmfn_tpu/serving + scripts/export_model.py).

The reference deploys by torch.load-ing a pickle inside the agent process
(mmfn_vectornet.py:117-129); the TPU rebuild ships a jax.export StableHLO
artifact instead. These tests prove the artifact contract: disk roundtrip,
batch polymorphism (one artifact, any batch), multi-platform lowering from a
CPU host, and the end-to-end CLI.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import build_model
from mmfn_tpu.serving import (export_forward, load_exported, save_exported,
                              serving_call)
from tests.conftest import clean_subprocess_env

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_rad():
    cfg = GlobalConfig(n_layer=1, max_lanes=8)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=2, max_lanes=8, resolution=64)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)
    return cfg, model, batch, variables


def test_export_roundtrip_symbolic_batch(tiny_rad, tmp_path):
    """Symbolic-batch artifact: serialize, reload, serve batches the export
    never saw, matching the direct forward."""
    _, model, batch, variables = tiny_rad
    path = str(tmp_path / "m.jaxexport")
    save_exported(export_forward(model, variables, batch), path)
    call = serving_call(load_exported(path))
    for bs in (1, 3):
        b = synthetic_batch(batch_size=bs, max_lanes=8, resolution=64)
        got = np.asarray(call(variables, b))
        want = np.asarray(model.apply(variables, b, False))
        assert got.shape == (bs, 4, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_export_multi_platform_lowering(tiny_rad):
    """A CPU host can produce a TPU serving artifact (lowering needs no
    device); the artifact records both platforms."""
    _, model, batch, variables = tiny_rad
    exp = export_forward(model, variables, batch, platforms=("tpu", "cpu"))
    assert exp.platforms == ("tpu", "cpu")
    # and it still deserializes + runs on the CPU lowering
    roundtrip = __import__("jax").export.deserialize(
        bytearray(exp.serialize()))
    got = np.asarray(jax.jit(roundtrip.call)(variables, batch))
    assert got.shape == (2, 4, 2) and np.isfinite(got).all()


@pytest.mark.slow
def test_export_cli(tiny_rad, tmp_path):
    """scripts/export_model.py: checkpoint dir -> artifact + external
    weights, loadable by the serving snippet from its docstring."""
    from flax import serialization

    from mmfn_tpu.train import create_train_state

    cfg, model, batch, variables = tiny_rad
    logdir = tmp_path / "run"
    logdir.mkdir()
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    with open(logdir / "best_model.msgpack", "wb") as f:
        f.write(serialization.to_bytes(state))

    out = str(tmp_path / "rad.jaxexport")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "export_model.py"),
         "--logdir", str(logdir), "--variant", "rad", "--out", out,
         "--cpu", "--n-layer", "1", "--max-lanes", "8",
         "--resolution", "64", "--batch", "2"],
        capture_output=True, text=True, env=clean_subprocess_env(), cwd=ROOT)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(out)
    vars_path = os.path.splitext(out)[0] + ".vars.msgpack"
    assert os.path.exists(vars_path)

    exp = load_exported(out)
    with open(vars_path, "rb") as f:
        served_vars = serialization.msgpack_restore(f.read())
    got = np.asarray(jax.jit(exp.call)(served_vars, batch))
    want = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
