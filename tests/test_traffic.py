"""Traffic lights / stop signs: cycle, gating, criteria, closed-loop scoring."""

import math

import numpy as np
import pytest

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.harness.criteria import RunningRedLightCriterion, RunningStopCriterion
from mmfn_tpu.harness.events import TrafficEventType
from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent
from mmfn_tpu.harness.agents.trivial import NpcAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.harness.traffic import (
    SignalSet, StopSign, TrafficLight, signals_from_rough_map)
from mmfn_tpu.mapping.rough_map import RoughLane, RoughMap
from tests.test_harness import STRAIGHT_XODR

def test_light_cycle_deterministic():
    li = TrafficLight(position=[0.0, 0.0], yaw=0.0, green=5, yellow=2, red=3)
    assert li.state(0.0) == "green"
    assert li.state(4.99) == "green"
    assert li.state(5.5) == "yellow"
    assert li.state(7.5) == "red"
    assert li.state(10.0) == "green"          # wraps
    always_red = TrafficLight(position=[0.0, 0.0], yaw=0.0, green=0, yellow=0, red=9)
    assert always_red.state(0.0) == "red" and always_red.state(8.9) == "red"


def test_light_gating_geometry():
    li = TrafficLight(position=[50.0, 0.0], yaw=0.0, green=0, yellow=0, red=100)
    t = 1.0
    assert li.gates(np.array([40.0, 0.0]), 0.0, t)            # approaching
    assert not li.gates(np.array([40.0, 0.0]), math.pi, t)    # wrong heading
    assert not li.gates(np.array([55.0, 0.0]), 0.0, t)        # already past
    assert not li.gates(np.array([40.0, 6.0]), 0.0, t)        # other lane
    green = TrafficLight(position=[50.0, 0.0], yaw=0.0, green=100, yellow=0, red=1)
    assert not green.gates(np.array([40.0, 0.0]), 0.0, t)     # green never gates


def test_red_light_criterion_fires_only_on_red_crossing():
    red = TrafficLight(position=[10.0, 0.0], yaw=0.0, green=0, yellow=0, red=1e9)
    green = TrafficLight(position=[30.0, 0.0], yaw=0.0, green=1e9, light_id=1)
    crit = RunningRedLightCriterion([red, green])
    for x in np.arange(0.0, 40.0, 0.5):
        crit.update((x, 0.0), 7.0, x / 7.0)
    assert len(crit.events) == 1
    assert crit.events[0].get_type() == TrafficEventType.TRAFFIC_LIGHT_INFRACTION
    # fires once even if we drive a loop through it again
    crit2_events = len(crit.events)
    for x in np.arange(0.0, 40.0, 0.5):
        crit.update((x, 0.0), 7.0, 10 + x / 7.0)
    assert len(crit.events) == crit2_events


def test_stop_criterion_served_vs_run():
    sign = StopSign(position=[20.0, 0.0], yaw=0.0)
    run_it = RunningStopCriterion([sign])
    for x in np.arange(0.0, 40.0, 0.5):                        # never slows
        run_it.update((x, 0.0), 7.0, x / 7.0)
    assert [e.get_type() for e in run_it.events] == [TrafficEventType.STOP_INFRACTION]

    served = RunningStopCriterion([StopSign(position=[20.0, 0.0], yaw=0.0)])
    t = 0.0
    for x in np.arange(0.0, 40.0, 0.5):
        speed = 0.0 if 10.0 <= x < 11.0 else 7.0               # full stop in zone
        served.update((x, 0.0), speed, t)
        t += 0.1
    assert served.events == []


def _route(length=120.0):
    return RouteConfig(route_id="0", town="TownTest",
                       trajectory=[(0.0, 1.75, 0.0), (length, 1.75, 0.0)], index=0)


def _expert(tool, tmp_path):
    return ExpertCollectionAgent({"rmap_tool": tool,
                                  "tmp_dir": str(tmp_path / "map"),
                                  "config": GlobalConfig()})


def test_expert_waits_for_red_then_proceeds(tool, tmp_path):
    """Red when the expert arrives (~10 s in), green later: the expert must
    stop at the line, wait out the phase, and still complete the route."""
    signals = SignalSet(lights=[TrafficLight(
        position=[60.0, 1.75], yaw=0.0, green=5, yellow=2, red=15)])
    agent = _expert(tool, tmp_path)
    record = ClosedLoopRunner(max_wall_seconds=120).run_route(
        agent, _route(), STRAIGHT_XODR, signals=signals)
    assert record.status == "Completed", record.to_dict()
    assert record.infractions["red_light"] == []
    assert record.scores["score_composed"] == 100.0


def test_expert_serves_stop_sign(tool, tmp_path):
    signals = SignalSet(stop_signs=[StopSign(position=[60.0, 1.75], yaw=0.0)])
    agent = _expert(tool, tmp_path)
    record = ClosedLoopRunner(max_wall_seconds=120).run_route(
        agent, _route(), STRAIGHT_XODR, signals=signals)
    assert record.status == "Completed", record.to_dict()
    assert record.infractions["stop_infraction"] == []


def test_npc_running_red_light_is_penalized(tool, tmp_path):
    """The NPC ignores signals: always-red light -> 0.7 composed penalty."""
    signals = SignalSet(lights=[TrafficLight(
        position=[60.0, 1.75], yaw=0.0, green=0, yellow=0, red=1e9)])
    record = ClosedLoopRunner(max_wall_seconds=60).run_route(
        NpcAgent({}), _route(), STRAIGHT_XODR, signals=signals)
    assert len(record.infractions["red_light"]) == 1, record.to_dict()
    assert record.scores["score_penalty"] == pytest.approx(0.7)


def test_npc_running_stop_sign_is_penalized(tool, tmp_path):
    signals = SignalSet(stop_signs=[StopSign(position=[60.0, 1.75], yaw=0.0)])
    record = ClosedLoopRunner(max_wall_seconds=60).run_route(
        NpcAgent({}), _route(), STRAIGHT_XODR, signals=signals)
    assert len(record.infractions["stop_infraction"]) == 1, record.to_dict()
    assert record.scores["score_penalty"] == pytest.approx(0.8)


def test_signals_from_rough_map():
    """Lights are placed where the route runs through traffic_control nodes."""
    n = 10
    xs = np.linspace(0, 90, n)
    nodes = np.zeros((n, 5))
    nodes[:, 0] = xs
    nodes[:, 1] = 1.75
    nodes[5:, 4] = 1.0          # controlled stretch starts at x=50
    rm = RoughMap()
    poly = np.array([[0, 0], [90, 0], [90, 3.5], [0, 3.5]], dtype=np.float64)
    rm.lanes = [RoughLane(poly, nodes)]
    route = [(float(x), 1.75) for x in np.arange(0, 91, 1.0)]
    signals = signals_from_rough_map(rm, route)
    assert len(signals.lights) >= 1
    first = signals.lights[0]
    assert 40.0 <= first.position[0] <= 60.0
    assert abs(first.yaw) < 0.1
    # dedupe: consecutive controlled nodes don't each get a light
    assert len(signals.lights) <= 3


def test_control_loss_perturbs_and_retires():
    from mmfn_tpu.harness.scenarios import ScenarioManagerLite, ScenarioTrigger

    mgr = ScenarioManagerLite([ScenarioTrigger(x=10.0, y=0.0, yaw=0.0,
                                               scenario_type="Scenario1")])
    # drive the ego past the three jitter points at [14, 48, 74] m
    # (control_loss.py:80); noise must fire inside the pulses and nowhere else
    noise = []
    ego_x = 10.0
    for _ in range(int(90 / 0.3)):
        mgr.tick(np.array([ego_x, 0.0]), 0.05)
        noise.append((ego_x - 10.0, mgr.steer_noise()))
        ego_x += 0.3
    nz = [abs(v) for _, v in noise if v != 0.0]
    assert nz, "control loss never perturbed steering"
    assert max(nz) <= 0.12 + 1e-9
    # jitter only near the srunner distances
    for driven, v in noise:
        if v != 0.0:
            assert any(d <= driven <= d + 4.5 for d in (14.0, 48.0, 74.0)), driven
    assert mgr.steer_noise() == 0.0        # retired after the last jitter


def test_expert_recovers_from_control_loss(tool, tmp_path):
    from mmfn_tpu.harness.scenarios import ScenarioTrigger

    triggers = [ScenarioTrigger(x=40.0, y=1.75, yaw=0.0, scenario_type="Scenario1")]
    agent = _expert(tool, tmp_path)
    record = ClosedLoopRunner(max_wall_seconds=120).run_route(
        agent, _route(), STRAIGHT_XODR, triggers=triggers)
    assert record.status == "Completed", record.to_dict()


def test_force_unblock_removes_blocker(tool, tmp_path):
    """MMFNPPilot analog: a permanently stalled vehicle blocks the lane; with
    force_unblock the stop counter fires, the blocker is deleted, and the
    route completes (without it the expert would sit until AgentBlocked)."""
    from mmfn_tpu.harness.scenarios import ScenarioTrigger

    # the stalled-vehicle behavior, reachable by name in the catalog
    triggers = [ScenarioTrigger(x=30.0, y=1.75, yaw=0.0,
                                scenario_type="StoppedVehicle")]
    agent = ExpertCollectionAgent({"rmap_tool": tool,
                                   "tmp_dir": str(tmp_path / "map"),
                                   "config": GlobalConfig(),
                                   "force_unblock": True,
                                   "unblock_ticks": 100})   # 5 s for test speed
    record = ClosedLoopRunner(max_wall_seconds=120).run_route(
        agent, _route(), STRAIGHT_XODR, triggers=triggers)
    assert record.status == "Completed", record.to_dict()
    assert len(record.infractions["collisions_vehicle"]) == 0


def test_force_green_unsticks_dead_light():
    li = TrafficLight(position=[0.0, 0.0], yaw=0.0, green=0, yellow=0, red=1e9)
    signals = SignalSet(lights=[li])
    assert li.state(50.0) == "red"
    signals.force_green(50.0, duration=10.0)
    assert li.state(55.0) == "green"
    assert li.state(61.0) == "red"          # reverts after the grace window


def test_scan_route_and_sample_scenarios():
    """Trigger-to-route matching (route_parser.py:137-178) and per-position
    sampling (route_scenario.py:304-357): highest ScenarioN wins a position,
    duplicates fall back, off-route and wrong-heading triggers are dropped."""
    import numpy as np

    from mmfn_tpu.harness.scenarios import (
        ScenarioTrigger, sample_scenarios, scan_route_for_scenarios)

    route = [(float(x), 0.0) for x in range(0, 101)]   # straight +x route
    triggers = [
        ScenarioTrigger(x=20.0, y=0.5, yaw=0.0, scenario_type="Scenario3"),
        ScenarioTrigger(x=20.0, y=0.5, yaw=0.0, scenario_type="Scenario7"),
        ScenarioTrigger(x=50.0, y=0.0, yaw=0.0, scenario_type="Scenario1"),
        # off-route (too far laterally)
        ScenarioTrigger(x=50.0, y=8.0, yaw=0.0, scenario_type="Scenario4"),
        # on-route position but opposing heading
        ScenarioTrigger(x=80.0, y=0.0, yaw=np.pi, scenario_type="Scenario2"),
    ]
    grouped = scan_route_for_scenarios(route, triggers)
    assert len(grouped) == 2                     # (20, 0.5) and (50, 0)
    sampled = sample_scenarios(grouped, seed=0)
    types = sorted(t.scenario_type for t in sampled)
    assert types == ["Scenario1", "Scenario7"]   # 7 beats 3 at the shared spot
