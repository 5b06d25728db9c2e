"""Coverage for the small framework-side modules: HumanAgent record/replay
(reference team_code/expert_agent/human_agent.py), MetricsLogger JSONL mode,
and the relay-safe profiling helpers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmfn_tpu.harness.agents.human import HumanAgent
from mmfn_tpu.harness.agents.base import VehicleControl
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from tests.test_harness import STRAIGHT_XODR


def test_human_agent_replay_drives_route(tmp_path):
    """Replay mode drives the fake world closed-loop from a recorded control
    log with no pygame/keyboard involvement; past the log's end it brakes."""
    log = [{"steer": 0.0, "throttle": 0.8, "brake": 0.0, "reverse": False}] * 40
    path = tmp_path / "log.json"
    path.write_text(json.dumps(log))

    agent = HumanAgent({"replay": str(path)})
    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (25.0, 1.75, 0.0)],
                         index=0)
    record = ClosedLoopRunner(max_wall_seconds=120).run_route(
        agent, config, STRAIGHT_XODR, max_ticks=60)
    assert record.scores["score_route"] > 0.0          # the car moved

    # past the end of the log the agent holds the brake
    c = agent.run_step({}, 0.0)
    assert c.brake == 1.0 and c.throttle == 0.0


def test_human_agent_record_writes_log(tmp_path):
    """Record mode appends each parsed control and flushes on destroy()."""
    rec = tmp_path / "rec.json"
    agent = HumanAgent({"record": str(rec)})

    class _StubReader:
        def render(self, rgb):
            pass

        def parse(self):
            return VehicleControl(steer=0.25, throttle=0.5)

    agent._reader = _StubReader()
    rgb = np.zeros((300, 400, 4), np.uint8)
    for _ in range(3):
        c = agent.run_step({"rgb": (0, rgb)}, 0.0)
        assert c.throttle == 0.5
    agent.destroy()
    saved = json.loads(rec.read_text())
    assert len(saved) == 3
    assert saved[0] == {"steer": 0.25, "throttle": 0.5, "brake": 0.0,
                        "reverse": False}


def test_human_agent_keyboard_reader_headless():
    """The pygame reader constructs and parses under the dummy video driver
    (no keys pressed -> null control)."""
    pytest.importorskip("pygame")
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from mmfn_tpu.harness.agents.human import KeyboardReader

    reader = KeyboardReader()
    reader.render(np.zeros((300, 400, 3), np.uint8))
    c = reader.parse()
    assert c.throttle == 0.0 and c.brake == 0.0 and c.steer == 0.0


def test_metrics_logger_jsonl(tmp_path):
    from mmfn_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(str(tmp_path), mode="disabled")
    logger.log({"loss": 1.5, "epoch": 0})
    logger.log({"loss": 0.5, "epoch": 1})
    logger.close()
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [l["loss"] for l in lines] == [1.5, 0.5]
    assert all("t" in l for l in lines)


def test_profiling_timeit_and_trace(tmp_path):
    from mmfn_tpu.utils.profiling import timeit, trace

    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((8, 8))
    dt = timeit(f, x, iters=3, warmup=1)
    assert dt > 0.0 and dt < 5.0

    with trace(str(tmp_path / "trace")):
        float(f(x).sum())
    assert any(True for _ in (tmp_path / "trace").rglob("*"))
