"""Composable behavior atoms (mmfn_tpu/harness/atoms.py — the srunner
atomic_behaviors.py / atomic_trigger_conditions.py analog vocabulary)."""

import math

import numpy as np
import pytest

from mmfn_tpu.harness.atoms import (EGO, FAILURE, RUNNING, SUCCESS,
                                    AccelerateToCatchUp, AccelerateToVelocity,
                                    ActorDestroy, ActorTransformSetter,
                                    BehaviorContext, DriveDistance,
                                    EgoDriveDistance, HandBrakeVehicle, Idle,
                                    InTriggerDistanceToVehicle, KeepVelocity,
                                    LaneChange, Parallel, Sequence,
                                    StandStill, StopVehicle, SyncArrival,
                                    WaypointFollower)
from mmfn_tpu.harness.scenarios import (SCENARIO_CLASSES, ScenarioManagerLite,
                                        ScenarioTrigger)

DT = 0.05


def _ctx(x=0.0, y=0.0, yaw=0.0):
    return BehaviorContext(ScenarioTrigger(x=x, y=y, yaw=yaw))


def _step_world(ctx, dt=DT):
    for a in ctx.actors.values():
        a.step(dt)


def test_transform_setter_spawns_in_trigger_frame():
    ctx = _ctx(x=10.0, y=5.0, yaw=math.pi / 2)   # trigger faces +y
    atom = ActorTransformSetter("v", ahead=20.0, lateral=3.5, speed=4.0)
    assert atom.tick(ctx, DT) == SUCCESS
    a = ctx.actors["v"]
    # ahead is +y, lateral (left) is -x
    np.testing.assert_allclose(a.position, [10.0 - 3.5, 25.0], atol=1e-9)
    np.testing.assert_allclose(a.velocity, [0.0, 4.0], atol=1e-9)


def test_keep_velocity_bounds_and_stop_vehicle():
    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0).tick(ctx, DT)
    keep = KeepVelocity("v", speed=10.0, distance=5.0)
    t = 0.0
    while keep.tick(ctx, DT) == RUNNING:
        _step_world(ctx)
        t += DT
        assert t < 5.0, "KeepVelocity distance bound never hit"
    assert np.linalg.norm(ctx.actors["v"].position) >= 5.0
    stop = StopVehicle("v", brake_value=1.0)   # 8 m/s^2 from 10 m/s
    ticks = 0
    while stop.tick(ctx, DT) == RUNNING:
        _step_world(ctx)
        ticks += 1
    assert ticks * DT == pytest.approx(10.0 / 8.0, abs=3 * DT)
    assert float(np.linalg.norm(ctx.actors["v"].velocity)) == 0.0


def test_accelerate_to_velocity_ramps():
    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0, speed=2.0).tick(ctx, DT)
    acc = AccelerateToVelocity("v", target_speed=10.0)   # 4 m/s^2
    ticks = 0
    while acc.tick(ctx, DT) == RUNNING:
        _step_world(ctx)
        ticks += 1
    assert ticks * DT == pytest.approx(8.0 / 4.0, abs=3 * DT)


def test_sequence_cascades_instantaneous_children():
    """Spawn + handbrake + idle compose: the two instantaneous atoms resolve
    on the same tick, then Idle holds the sequence RUNNING."""
    ctx = _ctx()
    seq = Sequence(ActorTransformSetter("v", ahead=5.0, speed=3.0),
                   HandBrakeVehicle("v"),
                   Idle(0.5),
                   ActorDestroy("v"))
    assert seq.tick(ctx, DT) == RUNNING          # spawned + braked, idling
    assert "v" in ctx.actors
    assert float(np.linalg.norm(ctx.actors["v"].velocity)) == 0.0
    for _ in range(20):
        if seq.tick(ctx, DT) == SUCCESS:
            break
    assert "v" not in ctx.actors                 # destroyed at the end


def test_parallel_policies():
    ctx = _ctx()
    one = Parallel(Idle(0.2), Idle(10.0), policy="one")
    ticks = 0
    while one.tick(ctx, DT) == RUNNING:
        ticks += 1
    assert ticks * DT <= 0.25
    both = Parallel(Idle(0.1), Idle(0.3), policy="all")
    ticks = 0
    while both.tick(ctx, DT) == RUNNING:
        ticks += 1
    assert ticks * DT == pytest.approx(0.3, abs=2 * DT)


def test_missing_actor_is_failure():
    ctx = _ctx()
    assert KeepVelocity("ghost", 5.0).tick(ctx, DT) == FAILURE
    assert Sequence(KeepVelocity("ghost", 5.0)).tick(ctx, DT) == FAILURE


def test_condition_atoms():
    ctx = _ctx()
    ActorTransformSetter("v", ahead=30.0).tick(ctx, DT)
    near = InTriggerDistanceToVehicle("v", EGO, distance=10.0)
    ctx.observe(np.array([0.0, 0.0]), DT)
    assert near.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([25.0, 0.0]), DT)
    assert near.tick(ctx, DT) == SUCCESS

    drive = EgoDriveDistance(5.0)
    ctx.observe(np.array([0.0, 0.0]), DT)
    assert drive.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([3.0, 0.0]), DT)
    assert drive.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([6.0, 0.0]), DT)
    assert drive.tick(ctx, DT) == SUCCESS

    still = StandStill("v", duration=0.2)
    for _ in range(3):
        assert still.tick(ctx, DT) == RUNNING
    assert still.tick(ctx, DT) == SUCCESS        # stationary 0.2 s


def test_lane_change_shifts_one_lane():
    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0, speed=10.0).tick(ctx, DT)
    lc = LaneChange("v", direction="left", lane_width=3.5, seconds=1.0)
    while lc.tick(ctx, DT) == RUNNING:
        _step_world(ctx)
    _step_world(ctx)
    a = ctx.actors["v"]
    assert a.position[1] == pytest.approx(3.5, abs=0.3)   # one lane left
    assert a.velocity[1] == 0.0                           # shift finished
    assert a.velocity[0] == pytest.approx(10.0, abs=1e-6)


def test_waypoint_follower_traces_polyline():
    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0).tick(ctx, DT)
    wf = WaypointFollower("v", [(10.0, 0.0), (10.0, 10.0)], speed=20.0)
    seen_corner = False
    for _ in range(200):
        status = wf.tick(ctx, DT)
        _step_world(ctx)
        pos = ctx.actors["v"].position
        if np.linalg.norm(pos - np.array([10.0, 0.0])) < 1.5:
            seen_corner = True
        if status == SUCCESS:
            break
    assert status == SUCCESS and seen_corner
    assert np.linalg.norm(ctx.actors["v"].position
                          - np.array([10.0, 10.0])) < 1.5


def test_sync_arrival_paces_to_conflict_point():
    """SyncArrival (atomic_behaviors.py:1210): actor and ego arrive together;
    a parked ego holds the actor short (negotiation)."""
    ctx = _ctx(x=10.0, yaw=0.0)
    cp = ctx.world_point(18.0, 0.0)
    ActorTransformSetter("v", ahead=18.0, lateral=25.0,
                         heading_deg=-90.0).tick(ctx, DT)
    sync = SyncArrival("v", conflict_ahead=18.0, target_speed=15.0)
    ego_x, t_ego, t_act = 0.0, None, None
    for i in range(2000):
        ctx.observe(np.array([ego_x, 0.0]), DT)
        sync.tick(ctx, DT)
        _step_world(ctx)
        if t_ego is None and ego_x >= cp[0]:
            t_ego = i * DT
        if t_act is None and np.linalg.norm(
                ctx.actors["v"].position - cp) < 3.0:
            t_act = i * DT
        if t_ego is not None and t_act is not None:
            break
        ego_x += 6.0 * DT
    assert t_ego is not None and t_act is not None
    assert abs(t_act - t_ego) < 2.0

    # parked ego: actor waits
    ctx2 = _ctx(x=10.0, yaw=0.0)
    ActorTransformSetter("v", ahead=18.0, lateral=25.0,
                         heading_deg=-90.0).tick(ctx2, DT)
    sync2 = SyncArrival("v", conflict_ahead=18.0, target_speed=15.0)
    for _ in range(400):
        ctx2.observe(np.array([10.0, 0.0]), DT)
        sync2.tick(ctx2, DT)
        _step_world(ctx2)
    assert np.linalg.norm(ctx2.actors["v"].position - cp) > 10.0
    assert float(np.linalg.norm(ctx2.actors["v"].velocity)) < 0.5


# --------------------------------------------------------------------------- #
# atom-composed scenario types, end to end through ScenarioManagerLite
# --------------------------------------------------------------------------- #


def test_atom_scenarios_registered():
    assert SCENARIO_CLASSES["OccludedObjectCrossing"].__name__ \
        == "OccludedObjectCrossing"
    assert SCENARIO_CLASSES["CutInFromLeftLane"].__name__ \
        == "CutInFromLeftLane"


def test_occluded_object_crossing_hides_then_crosses():
    """The walker holds behind the blocker until the ego closes to 18 m,
    then crosses the road at 3.4 m/s (object_crash_vehicle.py blocker
    variant); everything retires after the ego drives clear."""
    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=20.0, y=0.0, yaw=0.0, scenario_type="OccludedObjectCrossing")])
    ego_x = 0.0
    walker_start_y = None
    walker_moved_before_trigger = False
    crossed = False
    for _ in range(3000):
        actors = mgr.tick(np.array([ego_x, 0.0]), DT)
        walkers = [a for a in actors if a.kind == "walker"]
        if walkers:
            w = walkers[0]
            if walker_start_y is None:
                walker_start_y = float(w.position[1])
            gap = float(np.linalg.norm(w.position - np.array([ego_x, 0.0])))
            if gap > 19.0 and abs(w.position[1] - walker_start_y) > 0.1:
                walker_moved_before_trigger = True
            if w.position[1] < walker_start_y - 8.0:
                crossed = True
        if mgr.behaviors[0].done:
            break
        ego_x += 6.0 * DT
    assert walker_start_y is not None, "walker never spawned"
    assert not walker_moved_before_trigger, "walker crossed before the ego was near"
    assert crossed, "walker never crossed the road"
    assert mgr.behaviors[0].done


def test_cut_in_from_left_lane_catches_up_then_merges():
    """The cut-in car starts behind the ego in the adjacent lane, catches up
    (AccelerateToCatchUp), then merges into the ego lane ahead of it."""
    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=10.0, y=0.0, yaw=0.0, scenario_type="CutInFromLeftLane")])
    ego_x = 0.0
    spawned_behind = False
    merged_ahead = False
    for _ in range(4000):
        actors = mgr.tick(np.array([ego_x, 0.0]), DT)
        if actors:
            a = actors[0]
            if a.position[0] < ego_x and abs(a.position[1] - 3.5) < 0.5:
                spawned_behind = True
            if (a.position[0] > ego_x + 5.0 and abs(a.position[1]) < 0.8
                    and spawned_behind):
                merged_ahead = True
        if mgr.behaviors[0].done:
            break
        ego_x += 6.0 * DT
    assert spawned_behind, "cut-in car never appeared behind the ego in the left lane"
    assert merged_ahead, "cut-in car never merged into the ego lane ahead"
    assert mgr.behaviors[0].done


def test_actor_source_and_sink_stream_traffic():
    """ActorSource spawns a new vehicle whenever the previous has cleared
    the spacing gap (atomic_behaviors.py:2119); ActorSink retires them at
    the drain point (:2192)."""
    from mmfn_tpu.harness.atoms import ActorSink, ActorSource

    ctx = _ctx()
    src = ActorSource("s", ahead=0.0, speed=10.0, gap=20.0)
    sink = ActorSink(ahead=60.0, radius=5.0, prefix="s")
    peak = 0
    for _ in range(400):           # 20 s: spawn every 2 s, drain after 6 s
        assert src.tick(ctx, DT) == RUNNING
        assert sink.tick(ctx, DT) == RUNNING
        _step_world(ctx)
        peak = max(peak, len(ctx.actors))
    assert peak >= 3, "source never streamed multiple actors"
    # steady state: spawns balanced by the sink, never unbounded
    assert len(ctx.actors) <= 4
    # spacing: no two live actors closer than ~the gap at spawn time
    xs = sorted(float(a.position[0]) for a in ctx.actors.values())
    assert all(b - a > 15.0 for a, b in zip(xs, xs[1:]))


def test_keep_longitudinal_gap_regulates_to_reference():
    from mmfn_tpu.harness.atoms import ChangeAutoPilot, KeepLongitudinalGap

    ctx = _ctx()
    ActorTransformSetter("head", ahead=40.0, speed=5.0).tick(ctx, DT)
    ActorTransformSetter("lead", ahead=10.0, speed=12.0).tick(ctx, DT)
    assert ChangeAutoPilot("head", target_speed=5.0).tick(ctx, DT) == SUCCESS
    gapper = KeepLongitudinalGap("lead", reference="head", gap=8.0,
                                 max_speed=15.0)
    for _ in range(1200):          # 60 s to converge
        assert gapper.tick(ctx, DT) == RUNNING
        _step_world(ctx)
    gap = float((ctx.actors["head"].position
                 - ctx.actors["lead"].position) @ ctx.ahead)
    assert gap == pytest.approx(8.0, abs=1.5)
    assert float(np.linalg.norm(ctx.actors["lead"].velocity)) \
        == pytest.approx(5.0, abs=0.5)


def test_in_time_to_arrival_to_vehicle_triggers_on_closing():
    from mmfn_tpu.harness.atoms import InTimeToArrivalToVehicle

    ctx = _ctx()
    ActorTransformSetter("v", ahead=60.0, speed=0.0).tick(ctx, DT)
    ttc = InTimeToArrivalToVehicle("v", EGO, time=4.0)
    ego_x, fired_at_gap = 0.0, None
    for _ in range(2000):
        ctx.observe(np.array([ego_x, 0.0]), DT)
        if ttc.tick(ctx, DT) == SUCCESS:
            fired_at_gap = 60.0 - ego_x
            break
        ego_x += 5.0 * DT          # closing at 5 m/s -> fires at 20 m
    assert fired_at_gap is not None, "TTC never fired on a closing pair"
    assert fired_at_gap == pytest.approx(20.0, abs=1.0)

    # non-closing pair never triggers
    ctx2 = _ctx()
    ActorTransformSetter("v", ahead=10.0, speed=10.0).tick(ctx2, DT)
    ttc2 = InTimeToArrivalToVehicle("v", EGO, time=4.0)
    for i in range(200):
        ctx2.observe(np.array([i * 5.0 * DT, 0.0]), DT)
        assert ttc2.tick(ctx2, DT) == RUNNING
        _step_world(ctx2)


def test_signalized_junction_left_turn_traffic_scenario():
    """Oncoming stream through the junction while the ego crosses; the
    stream stays bounded (sink) and the scenario retires once the ego
    drives clear (signalized_junction_left_turn.py shape)."""
    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=10.0, y=0.0, yaw=0.0,
        scenario_type="SignalizedJunctionLeftTurnTraffic")])
    ego_x, saw_oncoming, peak = 0.0, False, 0
    for _ in range(4000):
        actors = mgr.tick(np.array([ego_x, 0.0]), DT)
        peak = max(peak, len(actors))
        for a in actors:
            if a.velocity[0] < -1.0:     # heading back toward the ego
                saw_oncoming = True
        if mgr.behaviors[0].done:
            break
        ego_x += 6.0 * DT
    assert saw_oncoming, "no oncoming traffic ever streamed"
    assert peak >= 2, "source never kept multiple vehicles alive"
    assert mgr.behaviors[0].done, "scenario never retired"


def test_platoon_follow_leading_vehicle_scenario():
    """Head cruises slow, lead regulates onto it (KeepLongitudinalGap), the
    TTC trigger arms the end condition (follow_leading_vehicle.py platoon
    shape with an obstacle ahead of the lead)."""
    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=5.0, y=0.0, yaw=0.0, scenario_type="PlatoonFollowLeadingVehicle")])
    ego_x, lead_regulated = 0.0, False
    for _ in range(6000):
        actors = mgr.tick(np.array([ego_x, 0.0]), DT)
        if len(actors) == 2:
            xs = sorted(float(a.position[0]) for a in actors)
            if 5.0 < xs[1] - xs[0] < 12.0:
                lead_regulated = True
        if mgr.behaviors[0].done:
            break
        ego_x += 6.0 * DT
    assert lead_regulated, "lead never settled near the 8 m platoon gap"
    assert mgr.behaviors[0].done, "scenario never retired"


def test_remove_actors_near_sticks_for_atom_behaviors():
    """Fault removal (ScenarioManagerLite.remove_actors_near — the
    reference's force_destory_actor) must not resurrect: AtomBehavior.step
    rebuilds .actors from its context dict, so removal edits the context."""
    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=5.0, y=0.0, yaw=0.0, scenario_type="OccludedObjectCrossing")])
    ego = np.array([5.0, 0.0])
    actors = mgr.tick(ego, DT)
    assert actors, "scenario never spawned"
    target = actors[0].position.copy()
    removed = mgr.remove_actors_near(target, radius=2.0)
    assert removed >= 1
    after = mgr.tick(ego, DT)
    assert all(float(np.linalg.norm(a.position - target)) > 1.0
               for a in after), "removed actor resurrected on the next tick"


def test_actor_ids_never_reused_after_sink():
    """ActorSource ids stay unique across ActorSink removals (replay.py's
    per-id collision dedup would silently skip a collision with a reused
    id's second holder)."""
    from mmfn_tpu.harness.atoms import ActorSink, ActorSource

    ctx = _ctx()
    src = ActorSource("s", ahead=0.0, speed=10.0, gap=20.0)
    sink = ActorSink(ahead=30.0, radius=5.0, prefix="s")
    seen = set()
    for _ in range(600):
        src.tick(ctx, DT)
        sink.tick(ctx, DT)
        _step_world(ctx)
        live = [a.actor_id for a in ctx.actors.values()]
        assert len(live) == len(set(live)), "two live actors share an id"
        seen.update(live)
    assert len(seen) >= 4, "sink never recycled spawn slots"


# --------------------------------------------------------------------------- #
# round-3 additions: kinematic + world-service atoms
# --------------------------------------------------------------------------- #


def test_set_init_speed_along_heading():
    from mmfn_tpu.harness.atoms import SetInitSpeed

    ctx = _ctx(yaw=math.pi / 2)
    ActorTransformSetter("v", ahead=0.0, heading_deg=0.0).tick(ctx, DT)
    assert SetInitSpeed("v", init_speed=6.0).tick(ctx, DT) == SUCCESS
    np.testing.assert_allclose(ctx.actors["v"].velocity, [0.0, 6.0],
                               atol=1e-9)
    assert SetInitSpeed("ghost").tick(ctx, DT) == FAILURE


def test_basic_agent_behavior_reaches_target():
    from mmfn_tpu.harness.atoms import BasicAgentBehavior

    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0).tick(ctx, DT)
    agent = BasicAgentBehavior("v", ahead=20.0, lateral=5.0,
                               target_speed=10.0)
    t = 0.0
    while agent.tick(ctx, DT) == RUNNING:
        _step_world(ctx)
        t += DT
        assert t < 10.0, "BasicAgentBehavior never arrived"
    d = float(np.linalg.norm(ctx.actors["v"].position
                             - ctx.world_point(20.0, 5.0)))
    assert d < BasicAgentBehavior.ACCEPTABLE_TARGET_DISTANCE
    assert float(np.linalg.norm(ctx.actors["v"].velocity)) == 0.0


def test_velocity_and_acceleration_triggers():
    from mmfn_tpu.harness.atoms import (AccelerateToVelocity,
                                        RelativeVelocityToOtherActor,
                                        TriggerAcceleration, TriggerVelocity)

    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0, speed=2.0).tick(ctx, DT)
    fast = TriggerVelocity("v", target_velocity=5.0)          # gt
    slow = TriggerVelocity("v", target_velocity=5.0, comparison="lt")
    accel = TriggerAcceleration("v", target_acceleration=2.0)  # 4 m/s^2 ramp
    rel = RelativeVelocityToOtherActor("v", EGO, speed=3.0)    # ego at rest
    ramp = AccelerateToVelocity("v", target_speed=10.0)
    assert fast.tick(ctx, DT) == RUNNING
    assert slow.tick(ctx, DT) == SUCCESS
    assert accel.tick(ctx, DT) == RUNNING      # needs two samples
    ctx.observe(np.array([0.0, 0.0]), DT)
    saw_accel = False
    for _ in range(100):
        ramp.tick(ctx, DT)
        _step_world(ctx)
        ctx.observe(np.array([0.0, 0.0]), DT)  # ego parked
        saw_accel = saw_accel or accel.tick(ctx, DT) == SUCCESS
        if fast.tick(ctx, DT) == SUCCESS:
            break
    assert fast.tick(ctx, DT) == SUCCESS
    assert saw_accel, "4 m/s^2 ramp never tripped the 2 m/s^2 trigger"
    assert rel.tick(ctx, DT) == SUCCESS        # 5+ m/s vs parked ego


def test_in_trigger_region_is_trigger_frame():
    from mmfn_tpu.harness.atoms import InTriggerRegion

    ctx = _ctx(x=10.0, y=0.0, yaw=math.pi / 2)   # ahead = +y, lateral = -x
    region = InTriggerRegion(EGO, min_x=5.0, max_x=15.0,
                             min_y=-2.0, max_y=2.0)
    ctx.observe(np.array([10.0, 0.0]), DT)       # at the trigger: ahead=0
    assert region.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([10.0, 8.0]), DT)       # 8 m ahead, centered
    assert region.tick(ctx, DT) == SUCCESS
    ctx.observe(np.array([5.0, 8.0]), DT)        # 5 m right of the box
    assert region.tick(ctx, DT) == RUNNING


def test_wait_until_in_front():
    from mmfn_tpu.harness.atoms import WaitUntilInFront

    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0, extent=2.45).tick(ctx, DT)
    cond = WaitUntilInFront("v", EGO, factor=1.0)   # length = 4.9 m
    ctx.observe(np.array([0.0, 0.0]), DT)
    assert cond.tick(ctx, DT) == RUNNING             # side by side
    ctx.actors["v"].position = np.array([7.0, 0.0])  # past 4.9, within 10
    assert cond.tick(ctx, DT) == SUCCESS
    ctx.actors["v"].position = np.array([40.0, 0.0])
    assert cond.tick(ctx, DT) == RUNNING             # in front but far
    far = WaitUntilInFront("v", EGO, factor=1.0, check_distance=False)
    assert far.tick(ctx, DT) == SUCCESS


def test_in_time_to_arrival_to_location():
    from mmfn_tpu.harness.atoms import InTimeToArrivalToLocation

    ctx = _ctx()
    ActorTransformSetter("v", ahead=0.0).tick(ctx, DT)
    cond = InTimeToArrivalToLocation("v", time=3.0, ahead=30.0)
    assert cond.tick(ctx, DT) == RUNNING    # at rest: TTA infinite
    ctx.actors["v"].velocity = np.array([5.0, 0.0])   # 30 m at 5 m/s = 6 s
    assert cond.tick(ctx, DT) == RUNNING
    ctx.actors["v"].velocity = np.array([15.0, 0.0])  # 2 s < 3 s
    assert cond.tick(ctx, DT) == SUCCESS


def _service_manager():
    """A ScenarioManagerLite with live world services (the replay.run_route
    auto-wiring analog for unit tests)."""
    from mmfn_tpu.harness.traffic import SignalSet, TrafficLight
    from mmfn_tpu.harness.weather import WeatherSim

    class _World:
        def __init__(self):
            self.calls = []

        def set_weather(self, preset, sun_altitude_deg=None):
            self.calls.append((preset, sun_altitude_deg))

    mgr = ScenarioManagerLite([])
    # offset=10 puts t=0 inside the yellow phase (10 green / 3 yellow / 10 red)
    mgr.signals = SignalSet(lights=[
        TrafficLight(position=np.array([5.0, 0.0]), yaw=0.0, offset=10.0,
                     light_id=3)])
    mgr.world = _World()
    mgr.weather_sim = WeatherSim(preset="ClearNoon", animation=False)
    return mgr


def test_world_service_atoms_drive_lights_and_weather():
    from mmfn_tpu.harness.atoms import (AtomBehavior, ChangeWeather,
                                        TimeOfDayComparison,
                                        TrafficLightStateSetter,
                                        WaitForTrafficLightState)

    class _LightFlip(AtomBehavior):
        def build_tree(self, ctx):
            return Sequence(
                TrafficLightStateSetter("green", duration=5.0),
                WaitForTrafficLightState("green"),
                ChangeWeather("HardRainNoon"),
                TimeOfDayComparison(10.0, comparison="gt"),  # clock at 11
            )

    mgr = _service_manager()
    assert mgr.signals.lights[0].state(0.0) == "yellow"
    SCENARIO_CLASSES["_TestLightFlip"] = _LightFlip
    try:
        flip = ScenarioManagerLite([ScenarioTrigger(
            x=0.0, y=0.0, yaw=0.0, scenario_type="_TestLightFlip")])
        flip.signals, flip.world = mgr.signals, mgr.world
        flip.weather_sim = mgr.weather_sim
        ego = np.array([0.0, 0.0])
        for _ in range(10):
            flip.tick(ego, DT)
        b = flip.behaviors[0]
        assert b.done, "service tree never completed"
        assert mgr.signals.lights[0].state(flip.game_time) == "green"
        assert mgr.weather_sim.preset == "HardRainNoon"
        assert mgr.world.calls and mgr.world.calls[-1][0] == "HardRainNoon"
    finally:
        SCENARIO_CLASSES.pop("_TestLightFlip")


def test_service_atoms_fail_gracefully_standalone():
    from mmfn_tpu.harness.atoms import (ChangeWeather, TimeOfDayComparison,
                                        TrafficLightStateSetter,
                                        WaitForTrafficLightState)

    ctx = _ctx()   # no manager: no signals / world / weather services
    assert TrafficLightStateSetter("red").tick(ctx, DT) == FAILURE
    assert WaitForTrafficLightState("red").tick(ctx, DT) == FAILURE
    assert ChangeWeather("WetNoon").tick(ctx, DT) == FAILURE
    assert TimeOfDayComparison(10.0).tick(ctx, DT) == RUNNING


def test_forced_light_state_yields_to_fault_removal():
    """force_green (the jammed-ego fault removal) outranks a scenario's
    TrafficLightStateSetter'd red."""
    from mmfn_tpu.harness.atoms import TrafficLightStateSetter

    mgr = _service_manager()
    ctx = BehaviorContext(ScenarioTrigger(x=0.0, y=0.0, yaw=0.0))
    ctx.manager = mgr
    assert TrafficLightStateSetter("red", duration=60.0).tick(ctx, DT) \
        == SUCCESS
    light = mgr.signals.lights[0]
    assert light.state(1.0) == "red"
    mgr.signals.force_green(game_time=1.0, duration=10.0)
    assert light.state(2.0) == "green"
    assert light.state(12.0) == "red"          # hold resumes after the grant
    # cycle resumes after the hold: (70 + offset 10) % 23 = 11 -> yellow
    assert light.state(70.0) == "yellow"


def test_add_noise_publishes_through_manager_steer_noise():
    from mmfn_tpu.harness.atoms import AddNoiseToVehicle, AtomBehavior

    class _Jitter(AtomBehavior):
        def build_tree(self, ctx):
            return AddNoiseToVehicle(0.3, duration=0.2)

    SCENARIO_CLASSES["_TestJitter"] = _Jitter
    try:
        mgr = ScenarioManagerLite([ScenarioTrigger(
            x=0.0, y=0.0, yaw=0.0, scenario_type="_TestJitter")])
        ego = np.array([0.0, 0.0])
        mgr.tick(ego, DT)
        assert mgr.steer_noise() == pytest.approx(0.3)
        for _ in range(10):
            mgr.tick(ego, DT)
        assert mgr.behaviors[0].done
        assert mgr.steer_noise() == 0.0
    finally:
        SCENARIO_CLASSES.pop("_TestJitter")


def test_failure_is_success_decorator():
    from mmfn_tpu.harness.atoms import FailureIsSuccess, TrafficLightStateSetter

    ctx = _ctx()   # no services -> the setter FAILs; decorated -> SUCCESS
    assert TrafficLightStateSetter("red").tick(ctx, DT) == FAILURE
    assert FailureIsSuccess(TrafficLightStateSetter("red")).tick(ctx, DT) \
        == SUCCESS
    wrapped = FailureIsSuccess(Idle(0.2))
    assert wrapped.tick(ctx, DT) == RUNNING   # RUNNING passes through


def test_maneuver_opposite_direction_scenario():
    """TS06: stationary blocker in the ego lane + oncoming stream in the
    opposite lane draining at the sink; ends after the ego drives 220 m."""
    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=10.0, y=0.0, yaw=0.0, scenario_type="ManeuverOppositeDirection")])
    ego_x = 10.0
    actors = mgr.tick(np.array([ego_x, 0.0]), DT)
    blocker = [a for a in actors if abs(a.position[1]) < 1.0]
    assert blocker and float(np.linalg.norm(blocker[0].velocity)) == 0.0
    np.testing.assert_allclose(blocker[0].position, [60.0, 0.0], atol=1e-6)
    oncoming_seen = 0
    for _ in range(3000):
        ego_x += 0.15   # 3 m/s
        actors = mgr.tick(np.array([ego_x, 0.0]), DT)
        if mgr.behaviors[0].done:
            break
        stream = [a for a in actors if a.position[1] > 2.0]
        oncoming_seen = max(oncoming_seen, len(stream))
        for a in stream:   # oncoming lane flows toward the ego at 5.56 m/s
            assert a.velocity[0] == pytest.approx(-5.56, abs=1e-6)
    assert mgr.behaviors[0].done, "never retired after 220 m"
    assert oncoming_seen >= 2, "stream never produced multiple vehicles"
    assert actors == [] or all(a.position[1] < 2.0 for a in actors)


def test_other_leading_vehicle_decelerates_on_approach():
    """TS05: the lead holds 15.3 m/s until the ego closes to 55 m (true at
    spawn: 35 m gap, as in the source), then drops to speed/3.2 while the
    left-lane vehicle keeps its pace."""
    from mmfn_tpu.harness.atoms import OtherLeadingVehicle

    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=0.0, y=0.0, yaw=0.0, scenario_type="OtherLeadingVehicle")])
    ego_x = 0.0
    mgr.tick(np.array([ego_x, 0.0]), DT)
    for _ in range(40):    # let the deceleration branch engage
        ego_x += 0.35
        actors = mgr.tick(np.array([ego_x, 0.0]), DT)
    lead = [a for a in actors if abs(a.position[1]) < 1.0][0]
    left = [a for a in actors if a.position[1] > 2.0][0]
    slow = OtherLeadingVehicle.FIRST_SPEED / 3.2
    assert float(np.linalg.norm(lead.velocity)) == pytest.approx(slow,
                                                                 rel=1e-3)
    assert float(np.linalg.norm(left.velocity)) == pytest.approx(
        OtherLeadingVehicle.SECOND_SPEED, rel=1e-3)
    for _ in range(3000):
        ego_x += 0.35   # 7 m/s -> 140 m in ~400 ticks
        mgr.tick(np.array([ego_x, 0.0]), DT)
        if mgr.behaviors[0].done:
            break
    assert mgr.behaviors[0].done


def test_signalized_junction_right_turn_forces_ego_light_red():
    """TS09: with route signals wired, the scenario holds the ego's light
    red (frozen) while the crossing vehicle syncs, crosses and stops."""
    from mmfn_tpu.harness.traffic import SignalSet, TrafficLight

    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=0.0, y=0.0, yaw=0.0, scenario_type="SignalizedJunctionRightTurn")])
    light = TrafficLight(position=np.array([15.0, 0.0]), yaw=0.0, light_id=9)
    mgr.signals = SignalSet(lights=[light])
    ego = np.array([0.0, 0.0])
    mgr.tick(ego, DT)                      # activate: spawn + light grab
    assert light.forced_state == "red"
    assert light.state(mgr.game_time) == "red"
    crossed = False
    for _ in range(3000):
        ego[0] += 0.1                      # ego creeps toward the junction
        actors = mgr.tick(ego, DT)
        for a in actors:
            crossed = crossed or a.position[1] < -30.0
        if mgr.behaviors[0].done:
            break
    assert mgr.behaviors[0].done
    assert crossed, "crossing vehicle never passed through the junction"


def test_signalized_junction_right_turn_runs_without_signals():
    """FailureIsSuccess keeps the kinematic part alive on unsignalized
    routes (the source sys.exits without a light; ours degrades)."""
    mgr = ScenarioManagerLite([ScenarioTrigger(
        x=0.0, y=0.0, yaw=0.0, scenario_type="SignalizedJunctionRightTurn")])
    ego = np.array([0.0, 0.0])
    actors = mgr.tick(ego, DT)
    assert len(actors) == 1                # crossing vehicle spawned
    assert not mgr.behaviors[0].done       # tree did not fail out


def test_change_noise_parameters_and_side_lane_tta():
    from mmfn_tpu.harness.atoms import (ChangeNoiseParameters,
                                        InTimeToArrivalToVehicleSideLane)

    ctx = _ctx()
    atom = ChangeNoiseParameters(noise_mean=0.05, noise_std=0.0,
                                 dynamic_mean_for_steer=0.01)
    assert atom.tick(ctx, DT) == SUCCESS
    assert ctx.steer_noise == pytest.approx(-0.04)   # min(0, -(0.05-0.01))

    ActorTransformSetter("cutter", ahead=-10.0, lateral=3.5,
                         speed=10.0).tick(ctx, DT)
    ctx.observe(np.array([0.0, 0.0]), DT)
    # target = ego + 3.5 left (side_lane='right' maps to the other's left
    # lane, where the cutter already is): 10 m behind at 10 m/s -> 1 s
    cond = InTimeToArrivalToVehicleSideLane("cutter", EGO, time=3.0,
                                            side_lane="right")
    assert cond.tick(ctx, DT) == SUCCESS
    slow = InTimeToArrivalToVehicleSideLane("cutter", EGO, time=0.5,
                                            side_lane="right")
    assert slow.tick(ctx, DT) == RUNNING
    ctx.actors["cutter"].velocity = np.zeros(2)       # at rest: TTA infinite
    assert cond.tick(ctx, DT) == RUNNING


# --------------------------------------------------------------------------- #
# lane-topology conditions (rmap in place of the Waypoint API)
# --------------------------------------------------------------------------- #

def _topology_map():
    """Two-lane straight road (road '7', lanes -1/-2 at y=1.75/5.25) whose
    nodes from x=60 onward are junction-flagged, plus an unrelated flagless
    road '8'."""
    from mmfn_tpu.mapping.rough_map import RoughLane, RoughMap

    def lane(y, lane_id, road_id="7", flag_from=60.0):
        xs = np.arange(0.0, 101.0, 10.0)
        nodes = np.zeros((len(xs), 5))
        nodes[:, 0] = xs
        nodes[:, 1] = y
        nodes[:, 2] = (xs >= flag_from).astype(float)
        poly = np.array([[0, y - 2], [100, y - 2], [100, y + 2], [0, y + 2]],
                        dtype=np.float64)
        return RoughLane(poly, nodes, widths=np.full(len(xs), 3.5),
                         road_id=road_id, lane_id=lane_id, node_s=xs.copy())

    rm = RoughMap()
    rm.lanes = [lane(1.75, -1), lane(5.25, -2),
                lane(200.0, -1, road_id="8", flag_from=1e9)]
    return rm


class _MapManager:
    def __init__(self, rough_map):
        self.rough_map = rough_map


def _map_ctx(rough_map):
    ctx = _ctx()
    ctx.manager = _MapManager(rough_map)
    return ctx


def test_in_trigger_distance_to_next_intersection():
    from mmfn_tpu.harness.atoms import InTriggerDistanceToNextIntersection

    ctx = _map_ctx(_topology_map())
    cond = InTriggerDistanceToNextIntersection(EGO, distance=20.0)
    ctx.observe(np.array([10.0, 1.75]), DT)   # 50 m of lane to the junction
    assert cond.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([45.0, 1.75]), DT)   # 15 m < 20
    assert cond.tick(ctx, DT) == SUCCESS
    # without a wired map the condition stays RUNNING (srunner would need
    # a CARLA map handle the same way)
    assert InTriggerDistanceToNextIntersection(EGO, 20.0).tick(_ctx(), DT) \
        == RUNNING


def test_wait_end_intersection():
    from mmfn_tpu.harness.atoms import WaitEndIntersection

    ctx = _map_ctx(_topology_map())
    cond = WaitEndIntersection(EGO)
    ctx.observe(np.array([10.0, 1.75]), DT)   # before the junction
    assert cond.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([70.0, 1.75]), DT)   # inside
    assert cond.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([70.0, 30.0]), DT)   # left it (laterally clear)
    assert cond.tick(ctx, DT) == SUCCESS


def test_at_rightmost_lane():
    from mmfn_tpu.harness.atoms import AtRightmostLane

    ctx = _map_ctx(_topology_map())
    cond = AtRightmostLane(EGO)
    ctx.observe(np.array([30.0, 1.75]), DT)   # lane -1: lane -2 is righter
    assert cond.tick(ctx, DT) == RUNNING
    ctx.observe(np.array([30.0, 5.25]), DT)   # lane -2: rightmost
    assert cond.tick(ctx, DT) == SUCCESS
