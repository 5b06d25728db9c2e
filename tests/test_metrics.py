"""Post-hoc metrics over episode recordings: the srunner metrics-module
analog (reference scenario_runner/metrics_manager.py +
srunner/metrics/tools/metrics_log.py + srunner/metrics/examples/)."""

import json
import math
import os

import numpy as np
import pytest

from mmfn_tpu.harness.metrics_log import (BasicMetric, MetricsLog,
                                          load_metric_class, run_metric)
from mmfn_tpu.harness.recording import EpisodeRecorder, criteria_summary
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.harness.scenarios import ScenarioTrigger

from tests.test_harness import STRAIGHT_XODR

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(ROOT, "examples", "metrics")


@pytest.fixture(scope="module")
def recording(tool):
    """One recorded episode: the NpcAgent drives a straight route into a
    StoppedVehicle scenario (no hazard logic -> a recorded collision)."""
    from mmfn_tpu.harness.agents.trivial import NpcAgent
    from mmfn_tpu.mapping import RoughMap

    import subprocess
    import tempfile

    d = tempfile.mkdtemp(prefix="metrics_map_")
    os.makedirs(os.path.join(d, "m"), exist_ok=True)
    with open(os.path.join(d, "m", "opstr.txt"), "w") as f:
        f.write(STRAIGHT_XODR)
    subprocess.run([tool, os.path.join(d, "m")], check=True,
                   capture_output=True)
    rmap = RoughMap().read(os.path.join(d, "m", "a.rmap"))

    config = RouteConfig(route_id="rec", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (120.0, 1.75, 0.0)],
                         index=0)
    triggers = [ScenarioTrigger(x=40.0, y=1.75, yaw=0.0,
                                scenario_type="StoppedVehicle")]
    rec = EpisodeRecorder()
    record = ClosedLoopRunner().run_route(NpcAgent(), config, STRAIGHT_XODR,
                                          triggers=triggers, rough_map=rmap,
                                          recorder=rec)
    return rec, record


def test_recording_shape(recording, tmp_path):
    rec, record = recording
    data = rec.data
    assert data["format"] == "mmfn_tpu-episode-v1"
    assert data["dt"] == pytest.approx(0.05)
    assert data["opendrive"].startswith("<?xml")
    assert len(data["frames"]) > 100
    # save/load round-trip
    path = tmp_path / "episode.json"
    rec.save(str(path))
    loaded = EpisodeRecorder.load(str(path))
    assert loaded["actors"] == data["actors"]
    assert loaded["frames"][10] == data["frames"][10]
    # the scored record rides along
    assert data["record"]["route_id"] == record.route_id


def test_metrics_log_queries(recording):
    rec, _ = recording
    log = MetricsLog(rec.data)
    n = log.get_total_frame_count()
    assert n > 100

    # time queries: fixed-step 20 Hz clock
    assert log.get_delta_time(5) == pytest.approx(0.05)
    assert log.get_elapsed_time(n - 1) == pytest.approx((n - 1) * 0.05)
    assert log.get_platform_time(n - 1) >= log.get_platform_time(0)

    # identity queries
    ego = log.get_ego_vehicle_id()
    assert ego == 0
    assert log.get_actor_ids_with_role_name("hero") == [0]
    scen = log.get_actor_ids_with_role_name("scenario")
    assert len(scen) == 1
    assert set(log.get_actor_ids_with_type_id("vehicle.*")) == {ego, scen[0]}
    assert log.get_actor_attributes(ego)["type_id"] == \
        "vehicle.lincoln.mkz2017"
    assert log.get_actor_bounding_box(scen[0]) == pytest.approx(2.2)

    # alive spans: ego lives from frame 0; the scenario actor activates when
    # the ego reaches the trigger radius
    e0, e1 = log.get_actor_alive_frames(ego)
    s0, s1 = log.get_actor_alive_frames(scen[0])
    assert e0 == 0 and e1 == n - 1
    assert s0 > 0 and s1 >= s0

    # transforms: the ego progresses along +x on the recorded route
    tr = log.get_all_actor_transforms(ego)
    assert tr.shape == (n, 3)
    assert tr[-1, 0] > tr[0, 0] + 50
    assert log.get_actor_transform(ego, 10) == pytest.approx(tuple(tr[10]))
    assert log.get_actor_transform(scen[0], 0) is None   # not yet alive
    by_frame = log.get_actor_transforms_at_frame(s0 + 1)
    assert ego in by_frame and scen[0] in by_frame

    # velocities: cruise speed mid-route ~7 m/s (NpcAgent target)
    v = log.get_actor_velocity(ego, n // 2)
    assert 3.0 < math.hypot(*v) < 9.0
    # finite-differenced acceleration/yaw-rate exist and are bounded
    ax, ay = log.get_actor_acceleration(ego, n // 2)
    assert abs(ax) < 20 and abs(ay) < 20
    assert abs(log.get_actor_angular_velocity(ego, n // 2)) < 5.0

    # controls: the recorded channel is the applied ego control
    steer, throttle, brake = log.get_vehicle_control(ego, 10)
    assert 0.0 <= throttle <= 1.0 and 0.0 <= brake <= 1.0
    assert log.get_vehicle_control(scen[0], 10) is None

    # collision: the NpcAgent plows into the stopped vehicle
    collisions = log.get_actor_collisions(ego)
    assert list(collisions.values()) == [scen[0]]
    (cframe,) = collisions.keys()
    assert s0 <= cframe <= s1

    # criteria summary rides in the recording
    crit = log.get_criteria()
    assert crit["RouteCompletion"]["expected_value_success"] == 100.0
    assert crit["RouteCompletion"]["test_status"] in ("SUCCESS", "FAILURE")
    # on-lane driving: at most a few % of the route outside the lane
    assert crit["OutsideRouteLanes"]["actual_value"] < 10.0


def test_example_metrics(recording, tmp_path):
    rec, _ = recording
    out = str(tmp_path)

    run_metric(os.path.join(EXAMPLES, "distance_between_vehicles.py"),
               rec.data, out_dir=out)
    with open(os.path.join(out, "DistanceBetweenVehicles.json")) as f:
        dbv = json.load(f)
    assert len(dbv["frames"]) == len(dbv["distance_m"]) > 10
    # the ego closes on the stopped vehicle: distance shrinks monotonically
    # at the start of the overlap
    assert dbv["distance_m"][0] > dbv["distance_m"][len(dbv["frames"]) // 2]
    assert min(dbv["distance_m"]) < 5.0

    run_metric(os.path.join(EXAMPLES, "distance_to_lane_center.py"),
               rec.data, out_dir=out)
    with open(os.path.join(out, "DistanceToLaneCenter.json")) as f:
        dlc = json.load(f)
    offs = np.abs(np.asarray(dlc["lateral_offset_m"]))
    # on-lane driving: median well inside the 3.5 m lane
    assert np.median(offs) < 1.2

    run_metric(os.path.join(EXAMPLES, "criteria_filter.py"),
               rec.data, out_dir=out)
    with open(os.path.join(out, "CriteriaFilter_results.json")) as f:
        cf = json.load(f)
    assert set(cf["RouteCompletion"]) == {"test_status", "actual_value",
                                          "success_value"}

    m = run_metric(os.path.join(EXAMPLES, "comfort.py"), rec.data,
                   out_dir=out)
    # the kinematic ego accelerates at <= 4 m/s^2 and brakes at <= 8 m/s^2
    assert 0.0 < m.results["accel_max_mps2"] <= 8.5
    assert (tmp_path / "Comfort.json").exists()


def test_load_metric_class_rejects_plain_module(tmp_path):
    p = tmp_path / "not_a_metric.py"
    p.write_text("x = 1\n")
    with pytest.raises(ValueError):
        load_metric_class(str(p))


def test_criteria_summary_fields():
    class FakeCompletion:
        percent = 100.0
        completed = True
        events = []

    class FakeBlocked:
        triggered = True
        events = ["x"]

    out = criteria_summary([FakeCompletion(), FakeBlocked()])
    assert out["FakeCompletion"]["test_status"] == "SUCCESS"
    assert out["FakeCompletion"]["actual_value"] == 100.0
    assert out["FakeBlocked"]["test_status"] == "FAILURE"
    assert out["FakeBlocked"]["actual_value"] == 1


def test_metrics_run_cli(recording, tmp_path, monkeypatch):
    """metrics_run.py end-to-end (the metrics_manager.py entry analog)."""
    import importlib.util

    rec, _ = recording
    log_path = tmp_path / "ep.json"
    rec.save(str(log_path))
    out = tmp_path / "out"

    spec = importlib.util.spec_from_file_location(
        "metrics_run", os.path.join(ROOT, "run_steps", "metrics_run.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr("sys.argv", [
        "metrics_run.py", "--log", str(log_path),
        "--metric", os.path.join(EXAMPLES, "criteria_filter.py"),
        "--out", str(out), "--no-map"])
    mod.main()
    assert (out / "CriteriaFilter_results.json").exists()


def test_metrics_log_round3_surfaces(recording):
    """The formerly-omitted CARLA-recorder surfaces: physics envelopes,
    walker speed, vectorized at-frame/all-frame variants, vehicle lights,
    scene lighting (reference srunner/metrics/tools/metrics_log.py:
    336-416)."""
    rec, _ = recording
    log = MetricsLog(rec.data)
    n = log.get_total_frame_count()
    ego = log.get_ego_vehicle_id()
    (scen,) = log.get_actor_ids_with_role_name("scenario")
    s0, _ = log.get_actor_alive_frames(scen)

    # physics envelopes: ego from KinematicWorld, NPC from the atom constants
    pc = log.get_vehicle_physics_control(ego, n // 2)
    assert pc["max_accel"] == pytest.approx(4.0)
    assert pc["max_brake"] == pytest.approx(8.0)
    npc_pc = log.get_vehicle_physics_control(scen, s0 + 1)
    assert npc_pc == {"max_accel": 4.0, "max_brake": 8.0}
    assert log.get_vehicle_physics_control(9999, 0) is None

    # walker speed: the scenario actor is a vehicle -> None
    assert log.get_walker_speed(scen, s0 + 1) is None
    assert log.get_walker_speed(ego, 0) is None           # not a walker

    # vectorized variants agree with their scalar counterparts
    f = n // 2
    vels = log.get_actor_velocities_at_frame(f)
    assert vels[ego] == pytest.approx(log.get_actor_velocity(ego, f))
    accs = log.get_actor_accelerations_at_frame(f)
    assert accs[ego] == pytest.approx(log.get_actor_acceleration(ego, f))
    ws = log.get_actor_angular_velocities_at_frame(f)
    assert ws[ego] == pytest.approx(log.get_actor_angular_velocity(ego, f))
    all_w = log.get_all_actor_angular_velocities(ego)
    assert all_w.shape == (n,)
    assert all_w[f] == pytest.approx(log.get_actor_angular_velocity(ego, f))
    all_a = log.get_all_actor_accelerations(ego)
    assert all_a.shape == (n, 2)
    assert tuple(all_a[f]) == pytest.approx(log.get_actor_acceleration(ego, f))

    # vehicle lights: the NpcAgent plows into the stopped vehicle; at the
    # very least the flags are well-formed lists over the ego's life
    lights = log.get_vehicle_lights(ego, f)
    assert isinstance(lights, list)
    assert log.get_vehicle_lights(scen, 0) is None        # not yet alive
    assert log.is_vehicle_light_active("Brake", ego, f) == \
        ("Brake" in lights)

    # no signals on this route: freeze/phase/volume fall back gracefully
    assert log.is_traffic_light_frozen(0, f) is False
    assert log.get_traffic_light_state_time(0, "green", f) is None
    assert log.get_traffic_light_trigger_volume(0) is None

    # scene lighting: recorded presets are daytime Clear* -> lamps off
    scene = log.get_scene_light_state(0, f)
    assert scene is not None and scene["is_on"] is False


def test_metrics_log_light_and_weather_surfaces():
    """Recorder + MetricsLog over a signalized, scenario-forced episode:
    lights_meta, frozen flags, trigger volume, phase durations, scene
    lights at dusk — recorded directly through the recorder hooks (no
    closed loop needed)."""
    import numpy as np

    from mmfn_tpu.harness.traffic import SignalSet, TrafficLight

    class _World:
        x, y, yaw, v = 0.0, 0.0, 0.0, 5.0
        MAX_ACCEL, MAX_BRAKE, DRAG = 4.0, 8.0, 0.1
        weather = "WetCloudySunset"

    class _Control:
        steer, throttle, brake = 0.0, 0.0, 0.6

    light = TrafficLight(position=np.array([30.0, 0.0]), yaw=0.0,
                         green=7.0, yellow=2.0, red=11.0, light_id=5)
    signals = SignalSet(lights=[light])
    rec = EpisodeRecorder()
    rec.start("<OpenDRIVE/>", 0.05, "sigroute", signals=signals)
    # tick 0: free-cycling; tick 1: scenario-forced red (a hold)
    rec.record_tick(0.0, 0.01, _World(), [], 0, _Control(),
                    signals.light_states(0.0))
    light.forced_state, light.forced_state_until = "red", 10.0
    rec.record_tick(0.05, 0.02, _World(), [], 0, _Control(),
                    signals.light_states(0.05))

    log = MetricsLog(rec.data)
    assert log.is_traffic_light_frozen(0, 0) is False
    assert log.is_traffic_light_frozen(0, 1) is True
    assert log.get_traffic_light_state(0, 1) == "red"
    assert log.get_traffic_light_state_time(0, "green", 0) == 7.0
    assert log.get_traffic_light_state_time(0, "red", 0) == 11.0
    vol = log.get_traffic_light_trigger_volume(0)
    assert vol["x"] == 30.0 and vol["lateral_half_width"] == 4.0
    # braking ego at dusk: Brake + the automatic Position/LowBeam
    assert log.get_vehicle_lights(0, 1) == ["Brake", "Position", "LowBeam"]
    assert log.get_scene_light_state(0, 1)["is_on"] is True
    assert log.get_weather(1) == "WetCloudySunset"
