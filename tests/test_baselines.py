"""Forward tests for the baseline model zoo (AIM / CILRS / TransFuser)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.models import get_entry_point

CFG = GlobalConfig(n_layer=1, max_lanes=8)
RES = 64


def _init(model, batch, *extra):
    # jitted init: bare model.init dispatches the forward op-by-op (CLAUDE.md)
    return jax.jit(model.init, static_argnums=(2 + len(extra),))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, *extra, False)


def test_aim_forward():
    batch = synthetic_batch(2, max_lanes=8, resolution=RES)
    model = get_entry_point("aim")(CFG)
    variables = _init(model, batch)
    out = model.apply(variables, batch, False)
    assert out.shape == (2, 4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_cilrs_forward():
    batch = synthetic_batch(2, max_lanes=8, resolution=RES)
    command = jnp.asarray([1, 4])
    model = get_entry_point("cilrs")(CFG)
    variables = _init(model, batch, command)
    steer, throttle, brake, vel = model.apply(variables, batch, command, False)
    assert steer.shape == throttle.shape == brake.shape == (2,)
    assert vel.shape == (2, 1)
    assert np.all(np.abs(np.asarray(steer)) <= 1.0)
    assert np.all(np.asarray(throttle) >= 0) and np.all(np.asarray(throttle) <= CFG.max_throttle)
    # command 0 selects no branch -> zero control
    zero_out = model.apply(variables, batch, jnp.asarray([0, 0]), False)
    assert np.allclose(np.asarray(zero_out[2]), 0.0)


def test_transfuser_forward():
    batch = synthetic_batch(2, max_lanes=8, resolution=RES)
    model = get_entry_point("transfuser")(CFG)
    variables = _init(model, batch)
    out = model.apply(variables, batch, False)
    assert out.shape == (2, 4, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_baseline_agent_closed_loop_smoke():
    """AIM baseline drives a few ticks in the fake world end-to-end."""
    import jax as _jax

    from mmfn_tpu.harness.agents.baseline import BaselineAgent
    from mmfn_tpu.harness.replay import ClosedLoopRunner
    from mmfn_tpu.harness.route import RouteConfig
    from tests.test_harness import STRAIGHT_XODR

    model = get_entry_point("aim")(CFG)
    batch = synthetic_batch(2, max_lanes=8, resolution=256)
    variables = _init(model, batch)
    agent = BaselineAgent({"kind": "aim", "model": model, "variables": variables,
                           "config": CFG})
    # warm the jit outside the runner's wall clock
    import numpy as _np
    agent._forward(variables, jnp.zeros((256, 256, 3)), jnp.zeros((1024, 4)),
                   jnp.zeros(2), jnp.float32(0.0), jnp.int32(4))

    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (60.0, 1.75, 0.0)], index=0)
    record = ClosedLoopRunner(max_wall_seconds=120).run_route(
        agent, config, STRAIGHT_XODR, max_ticks=5)
    assert agent.step >= 4
    assert np.isfinite(record.scores["score_composed"])


@pytest.mark.slow
def test_engine_trains_baselines():
    """The shared Engine trains the baseline zoo: AIM/TransFuser via waypoint
    L1, CILRS via its command-branched composite loss (cilrs/train.py:93-96).
    The reference ships per-baseline train loops; one engine covers all."""
    import optax
    from mmfn_tpu.train import create_train_state, make_train_step

    batch = synthetic_batch(4, max_lanes=8, resolution=RES)
    for name in ("aim", "cilrs"):
        model = get_entry_point(name)(CFG)
        state = create_train_state(model, CFG, jax.random.PRNGKey(0), batch,
                                   tx=optax.adamw(1e-3))
        step = make_train_step(model, optax.adamw(1e-3))
        losses = []
        for _ in range(4):
            state, loss = step(state, batch, jax.random.PRNGKey(2))
            losses.append(float(loss))
        assert np.isfinite(losses).all(), (name, losses)
        assert losses[-1] < losses[0], (name, losses)
