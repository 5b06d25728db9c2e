"""Harness tests: scoring math, routes, watchdog, sensor mux, closed loop."""

import math
import os
import subprocess
import time

import numpy as np
import pytest

from mmfn_tpu.harness import (
    RoadOption, RouteRecord, SensorInterface, SensorReceivedNoData,
    StatisticsManager, TrafficEvent, TrafficEventType, Watchdog,
    downsample_route, parse_routes_file, route_length)
from mmfn_tpu.harness.agents.base import AutonomousAgent, VehicleControl
from mmfn_tpu.harness.criteria import route_timeout_seconds
from mmfn_tpu.harness.replay import ClosedLoopRunner, KinematicWorld
from mmfn_tpu.harness.route import RouteConfig, RouteIndexer
from mmfn_tpu.harness.statistics import fetch_checkpoint

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STRAIGHT_XODR = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE>
  <header revMajor="1" revMinor="4" name="line"/>
  <road name="R0" length="500.0" id="0" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="500.0"><line/></geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
</OpenDRIVE>
"""


# ---------------------------- statistics ---------------------------------- #

def _ev(t, msg="", d=None):
    e = TrafficEvent(t, msg)
    if d:
        e.set_dict(d)
    return e


def test_route_statistics_penalties():
    sm = StatisticsManager()
    sm.set_route("r0", 0)
    events = [
        _ev(TrafficEventType.COLLISION_PEDESTRIAN, "hit a pedestrian"),
        _ev(TrafficEventType.TRAFFIC_LIGHT_INFRACTION, "ran a red light"),
        _ev(TrafficEventType.ROUTE_COMPLETION, d={"route_completed": 80.0}),
    ]
    rec = sm.compute_route_statistics(0, 1000.0, events)
    assert rec.scores["score_route"] == 80.0
    assert rec.scores["score_penalty"] == pytest.approx(0.50 * 0.70)
    assert rec.scores["score_composed"] == pytest.approx(80.0 * 0.35)
    assert rec.status.startswith("Failed")
    assert len(rec.infractions["collisions_pedestrian"]) == 1


def test_route_completed_and_global(tmp_path):
    sm = StatisticsManager()
    for i, (events, length) in enumerate([
        ([_ev(TrafficEventType.ROUTE_COMPLETED)], 500.0),
        ([_ev(TrafficEventType.STOP_INFRACTION, "stop"),
          _ev(TrafficEventType.ROUTE_COMPLETION, d={"route_completed": 50.0})], 2000.0),
    ]):
        sm.set_route(f"r{i}", i)
        rec = sm.compute_route_statistics(i, length, events)
        sm.save_record(rec, i, str(tmp_path / "ckpt.json"))

    g = sm.compute_global_statistics(2)
    assert g.scores["score_route"] == pytest.approx((100 + 50) / 2)
    assert g.scores["score_penalty"] == pytest.approx((1.0 + 0.8) / 2)
    # stop infraction normalized per driven km: 1 infraction / (0.5*2 km)
    assert g.infractions["stop_infraction"] == pytest.approx(1.0)
    sm.save_global_record(g, 2, str(tmp_path / "ckpt.json"))
    data = fetch_checkpoint(str(tmp_path / "ckpt.json"))
    assert data["labels"][0] == "Avg. driving score"
    assert len(data["_checkpoint"]["records"]) == 2

    # resume restores records
    sm2 = StatisticsManager()
    sm2.resume(str(tmp_path / "ckpt.json"))
    assert len(sm2.records) == 2


# ---------------------------- routes -------------------------------------- #

def test_parse_reference_route_file():
    path = os.path.join(ROOT, "tests", "fixtures", "route_town01.xml")
    configs = parse_routes_file(path)
    assert len(configs) == 1
    assert configs[0].town == "Town01"
    assert len(configs[0].trajectory) == 11
    assert route_length(configs[0].trajectory) > 100


def test_downsample_route_spacing():
    route = [((float(i), 0.0), RoadOption.LANEFOLLOW) for i in range(200)]
    ids = downsample_route(route, 50)
    assert ids[0] == 0 and ids[-1] == 199
    gaps = np.diff(ids)
    assert gaps.max() <= 52


def test_route_indexer_resume(tmp_path):
    path = os.path.join(ROOT, "tests", "fixtures", "route_town01.xml")
    idx = RouteIndexer(path, repetitions=3)
    assert len(idx) == 3
    idx.next()
    idx.next()
    idx.save_state(str(tmp_path / "ck.json"))
    idx2 = RouteIndexer(path, repetitions=3)
    idx2.resume(str(tmp_path / "ck.json"))
    assert idx2.peek()
    assert idx2.next().index == 2


# ---------------------------- watchdog / sensors --------------------------- #

def test_watchdog_expires_and_pets():
    fired = []
    wd = Watchdog(timeout=0.0, on_timeout=lambda: fired.append(1))  # ~1 s fuse
    wd.start()
    for _ in range(12):
        time.sleep(0.1)
        wd.update()
    assert wd.get_status()
    assert not fired                      # petted: callback must not fire
    wd.stop()

    fired2 = []
    wd2 = Watchdog(timeout=-0.9, on_timeout=lambda: fired2.append(1))  # 0.1 s fuse
    wd2.start()
    time.sleep(0.4)
    assert not wd2.get_status()
    assert fired2                         # expired: callback fired


def test_sensor_interface_gating_and_timeout():
    si = SensorInterface(queue_timeout=0.2)
    si.register_sensor("a")
    si.register_sensor("b")
    si.register_opendrive("map")
    si.update_sensor("a", 1, 0)
    si.update_sensor("b", 2, 0)
    data = si.get_data()  # opendrive missing but exempt
    assert set(data) == {"a", "b"}

    si.update_sensor("a", 3, 1)
    with pytest.raises(SensorReceivedNoData):
        si.get_data()  # b missing -> timeout

    with pytest.raises(Exception):
        si.register_sensor("a")  # duplicate


# ---------------------------- closed loop ---------------------------------- #

class ScriptedAgent(AutonomousAgent):
    """P-controller toward the planner target — validates world + criteria."""

    def setup(self, conf):
        from mmfn_tpu.control.planner import RoutePlanner
        self._planner = None

    def sensors(self):
        return [{"type": "sensor.other.gnss", "id": "gps"},
                {"type": "sensor.other.imu", "id": "imu"},
                {"type": "sensor.speedometer", "id": "speed"}]

    def run_step(self, input_data, timestamp):
        from mmfn_tpu.control.planner import RoutePlanner, GPS_SCALE
        if self._planner is None:
            self._planner = RoutePlanner(4.0, 50.0)
            self._planner.set_route(self._global_plan, gps=True)
        gps = input_data["gps"][1]
        pos = np.array([gps[0], gps[1]]) * GPS_SCALE
        yaw = input_data["imu"][1][-1]
        speed = input_data["speed"][1]["speed"]
        target, _ = self._planner.run_step(pos)
        desired = math.atan2(target[1] - pos[1], target[0] - pos[0])
        err = (desired - yaw + math.pi) % (2 * math.pi) - math.pi
        steer = float(np.clip(err, -1, 1))
        throttle = 0.7 if speed < 7 else 0.0
        return VehicleControl(steer=steer, throttle=throttle)


def test_closed_loop_scripted_agent_completes_route():
    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (150.0, 1.75, 0.0)], index=0)
    runner = ClosedLoopRunner()
    agent = ScriptedAgent()
    record = runner.run_route(agent, config, STRAIGHT_XODR)
    assert record.status == "Completed", record.to_dict()
    assert record.scores["score_composed"] == 100.0


def test_closed_loop_blocked_agent_scores_zero_progress():
    # long enough that the 180 s blocked detector beats the 0.8 s/m timeout
    config = RouteConfig(route_id="1", town="TownTest",
                         trajectory=[(0.0, 0.0, 0.0), (300.0, 0.0, 0.0)], index=0)

    class IdleAgent(AutonomousAgent):
        def run_step(self, input_data, timestamp):
            return VehicleControl()

    runner = ClosedLoopRunner(max_wall_seconds=30)
    record = runner.run_route(IdleAgent(), config, STRAIGHT_XODR,
                              max_ticks=int(185 / 0.05))
    assert "blocked" in record.status.lower() or "timed" in record.status.lower()
    # the stationary ego still "reaches" waypoints inside the 10 m snap radius
    assert record.scores["score_composed"] <= 10.0
    assert len(record.infractions["vehicle_blocked"]) == 1


def test_route_timeout_budget():
    assert route_timeout_seconds(100.0) == pytest.approx(85.0)


def test_npc_agent_completes_route():
    from mmfn_tpu.harness.agents.trivial import NpcAgent

    config = RouteConfig(route_id="npc", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (120.0, 1.75, 0.0)], index=0)
    record = ClosedLoopRunner().run_route(NpcAgent(), config, STRAIGHT_XODR)
    assert record.status == "Completed"


def test_outside_lanes_penalty(tool, tmp_path):
    """An agent driving off-lane accrues the outside-lanes percentage penalty."""
    import subprocess
    from mmfn_tpu.mapping import RoughMap

    d = tmp_path / "map"
    d.mkdir()
    (d / "opstr.txt").write_text(STRAIGHT_XODR)
    subprocess.run([tool, str(d)], check=True, capture_output=True)
    rmap = RoughMap().read(str(d / "a.rmap"))

    # route parallel to the lane but 12 m off it -> always outside
    config = RouteConfig(route_id="off", town="TownTest",
                         trajectory=[(0.0, 14.0, 0.0), (120.0, 14.0, 0.0)], index=0)
    record = ClosedLoopRunner().run_route(ScriptedAgent(), config, STRAIGHT_XODR,
                                          rough_map=rmap)
    assert record.status == "Completed"
    assert len(record.infractions["outside_route_lanes"]) == 1
    assert record.scores["score_penalty"] < 0.1  # ~100% outside

    # on-lane route -> no penalty (fresh manager => index 0)
    config2 = RouteConfig(route_id="on", town="TownTest",
                          trajectory=[(0.0, 1.75, 0.0), (120.0, 1.75, 0.0)], index=0)
    record2 = ClosedLoopRunner().run_route(ScriptedAgent(), config2, STRAIGHT_XODR,
                                           rough_map=rmap)
    assert record2.scores["score_penalty"] > 0.95


def test_sensors_reflect_actors():
    """Synthesized lidar/radar carry the live actors (learned agents see
    obstacles in the fake world, not noise)."""
    from mmfn_tpu.harness.replay import KinematicWorld
    from mmfn_tpu.harness.scenarios import ScenarioActor
    from mmfn_tpu.ops.lidar import lidar_to_histogram_features_np

    world = KinematicWorld(STRAIGHT_XODR, (0.0, 0.0, 0.0))
    world.v = 5.0

    # no actors: only ground returns (below the -2 m height split)
    lidar = world.sensor_frame()["lidar"][1]
    assert (lidar[:, 2] <= -2.0).all()

    # a stopped vehicle 10 m ahead, slightly left
    world.actors = [ScenarioActor("vehicle", np.array([10.0, 1.0]),
                                  np.zeros(2), extent=2.2, actor_id=7)]
    frame = world.sensor_frame()
    lidar = frame["lidar"][1]
    body = lidar[lidar[:, 2] > -2.0]
    assert len(body) > 0
    # sensor frame pre-flip: +y forward, +x right — the actor sits 1 m LEFT
    # of the ego (world y=+1, ego yaw 0), so lateral must be -1; the tight
    # tolerance (< extent) makes a left/right mirror fail this assertion
    assert abs(np.median(body[:, 1]) - 10.0) < 1.5
    assert abs(np.median(body[:, 0]) + 1.0) < 1.5
    # the BEV consumed by the model shows the obstacle ahead (-y half)
    pts = lidar[:, :3].copy()
    pts[:, 1] *= -1
    bev = lidar_to_histogram_features_np(pts)
    above = bev[..., 1]
    fwd_half = above[:, :above.shape[1] // 2]
    assert fwd_half.sum() > 0

    # front radar sees it approaching (ego moving, actor stopped -> closing<0)
    radar_front = frame["radar_front"][1]
    hits = radar_front[np.abs(radar_front[:, 3] - np.hypot(10.0, 1.0)) < 0.5]
    assert len(hits) == 1
    assert hits[0, 0] < -4.0            # ~ -ego speed
    # rear radar does not (outside its cone)
    radar_rear = frame["radar_rear"][1]
    assert not (np.abs(radar_rear[:, 3] - np.hypot(10.0, 1.0)) < 0.5).any()

    # an actor behind shows up in the rear radar instead
    world.actors = [ScenarioActor("vehicle", np.array([-12.0, 0.0]),
                                  np.zeros(2), extent=2.2, actor_id=8)]
    frame = world.sensor_frame()
    assert (np.abs(frame["radar_rear"][1][:, 3] - 12.0) < 0.5).any()
    assert not (np.abs(frame["radar_front"][1][:, 3] - 12.0) < 0.5).any()


def test_visibility_flags_gate_sensor_synthesis():
    """VisibilityAction semantics in the fake world: ``sensors=false``
    removes an actor from the lidar/radar returns, but physics stays on —
    the collision check still sees it (CARLA hides rendering/sensing, never
    collision)."""
    from mmfn_tpu.harness.replay import KinematicWorld
    from mmfn_tpu.harness.scenarios import ScenarioActor, check_collision

    world = KinematicWorld(STRAIGHT_XODR, (0.0, 0.0, 0.0))
    world.v = 5.0
    ghost = ScenarioActor("vehicle", np.array([10.0, 0.0]), np.zeros(2),
                          extent=2.2, actor_id=9, visible_sensors=False)
    world.actors = [ghost]
    frame = world.sensor_frame()
    lidar = frame["lidar"][1]
    assert (lidar[:, 2] <= -2.0).all()        # ground returns only
    # the hidden actor leaves NO trace: the radar frame is bit-identical to
    # an identically-seeded empty world's (random clutter CAN land near the
    # ghost's range, so "no return at range 10" would be flaky)
    empty = KinematicWorld(STRAIGHT_XODR, (0.0, 0.0, 0.0))
    empty.v = 5.0
    np.testing.assert_array_equal(frame["radar_front"][1],
                                  empty.sensor_frame()["radar_front"][1])
    # ... but it still collides: drive the ego onto it
    assert check_collision(np.array([9.0, 0.0]), 0.0, [ghost])


def test_weather_degrades_lidar_not_radar():
    """Rain presets physically affect the synthesized sensors: lidar range
    shrinks, per-actor returns thin out, weak backscatter appears; radar
    keeps its actor returns (the weather-robust modality) and only gains
    clutter. Clear weather is bit-identical to the pre-weather behavior."""
    from mmfn_tpu.harness.replay import KinematicWorld
    from mmfn_tpu.harness.scenarios import ScenarioActor

    def world(weather):
        w = KinematicWorld(STRAIGHT_XODR, (0.0, 0.0, 0.0), weather=weather)
        w.v = 5.0
        w.actors = [ScenarioActor("vehicle", np.array([25.0, 0.0]),
                                  np.zeros(2), extent=2.2, actor_id=3)]
        return w

    clear = world("ClearNoon").sensor_frame()
    rain = world("HardRainNoon").sensor_frame()

    # clear: the actor at 25 m is inside the 30 m lidar range -> body returns
    clear_body = clear["lidar"][1][clear["lidar"][1][:, 2] > -2.0]
    assert len(clear_body) > 0 and clear_body[:, 3].min() > 0.3
    # hard rain: range shrinks to ~19.5 m -> the actor vanishes from lidar;
    # what remains above ground is only weak backscatter
    rain_body = rain["lidar"][1][rain["lidar"][1][:, 2] > -2.0]
    assert len(rain_body) > 0
    assert rain_body[:, 3].max() < 0.2          # backscatter only
    assert np.abs(rain_body[:, 1] - 25.0).min() > 5.0

    # radar still sees the actor in the rain (closing velocity ~ -5)
    hits = rain["radar_front"][1]
    hit = hits[np.abs(hits[:, 3] - 25.0) < 0.5]
    assert len(hit) == 1 and hit[0, 0] < -4.0
    # ... with a thicker clutter floor than clear weather
    assert len(rain["radar_front"][1]) > len(clear["radar_front"][1])

    # a nearer actor stays visible in rain, with thinned returns
    near_clear, near_rain = world("ClearNoon"), world("MidRainyNoon")
    for w in (near_clear, near_rain):
        w.actors[0].position = np.array([10.0, 0.0])
    nb_clear = near_clear.sensor_frame()["lidar"][1]
    nb_rain = near_rain.sensor_frame()["lidar"][1]
    count = lambda f: ((f[:, 2] > -2.0) & (f[:, 3] > 0.3)).sum()
    assert 0 < count(nb_rain) < count(nb_clear)


def test_weather_sim_sun_evolution_and_presets():
    """WeatherSim (srunner weather_sim.py:33-89 analog): the sun altitude
    falls through the afternoon, and the live preset's time-of-day suffix
    follows it (Noon -> Sunset), keeping the family."""
    from mmfn_tpu.harness.weather import WEATHER_PRESETS, WeatherSim

    sim = WeatherSim(preset="HardRainNoon", start_hour=12.0,
                     time_scale=3600.0)   # 1 sim second = 1 weather hour
    assert sim.update(0.0) == "HardRainNoon"
    alt_noon = sim.sun_altitude_deg
    assert alt_noon > 45.0
    # 6 weather-hours later (18:00 local): sun below the 15-degree sunset
    # threshold, preset flips to the same-family Sunset entry
    late = sim.update(6.0)
    assert sim.sun_altitude_deg < alt_noon - 20.0
    assert late == "HardRainSunset"
    # midnight: altitude below horizon; table has no Night -> Sunset clamp
    assert sim.update(12.0) == "HardRainSunset"
    assert sim.sun_altitude_deg < 0.0
    # the CARLA table quirk (MidRainyNoon / MidRainSunset) round-trips
    quirk = WeatherSim(preset="MidRainyNoon", start_hour=12.0,
                       time_scale=3600.0)
    assert quirk.update(0.0) == "MidRainyNoon"
    assert quirk.update(6.0) == "MidRainSunset"
    assert quirk.update(6.0) in WEATHER_PRESETS
    # animation off: static preset, like the reference without a datetime
    static = WeatherSim(preset="ClearNoon", animation=False)
    assert static.update(1e6) == "ClearNoon"


def test_weather_sim_couples_to_sensor_synthesis():
    """A sunset dims the synthesized camera and a rain preset flip mid-route
    re-derives the lidar degradation — the WeatherBehavior-in-CARLA effect,
    explicit in the fake world."""
    from mmfn_tpu.harness.replay import KinematicWorld

    world = KinematicWorld(STRAIGHT_XODR, (0.0, 0.0, 0.0),
                           weather="ClearNoon")
    noon_rgb = world.sensor_frame()["rgb"][1]
    assert world._rain == 0.0
    world.set_weather("HardRainSunset", sun_altitude_deg=5.0)
    assert world._rain == 1.0                       # rain level re-derived
    dusk_rgb = world.sensor_frame()["rgb"][1]
    assert float(dusk_rgb.mean()) < 0.6 * float(noon_rgb.mean())


def test_closed_loop_recording_shows_weather_evolving(tmp_path):
    """End-to-end: a route driven under an animated WeatherSim records an
    evolving weather preset, queryable via MetricsLog.get_weather."""
    from mmfn_tpu.harness.agents.trivial import NpcAgent
    from mmfn_tpu.harness.metrics_log import MetricsLog
    from mmfn_tpu.harness.recording import EpisodeRecorder
    from mmfn_tpu.harness.replay import ClosedLoopRunner
    from mmfn_tpu.harness.route import RouteConfig
    from mmfn_tpu.harness.weather import WeatherSim

    recorder = EpisodeRecorder()
    sim = WeatherSim(preset="ClearNoon", start_hour=13.0,
                     time_scale=3600.0)   # hours pass in seconds of route
    config = RouteConfig(route_id="w", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (120.0, 1.75, 0.0)],
                         index=0)
    agent = NpcAgent()
    record = ClosedLoopRunner(max_wall_seconds=120).run_route(
        agent, config, STRAIGHT_XODR, recorder=recorder, weather_sim=sim)
    assert record.scores["score_route"] > 95.0
    log = MetricsLog(recorder.data)
    n = log.get_total_frame_count()
    assert log.get_weather(0) == "ClearNoon"
    assert log.get_weather(n - 1) == "ClearSunset"   # the sun set en route


def test_parse_route_weather_element(tmp_path):
    """Per-route <weather> elements (route_parser.py:62-110) quantize onto
    the preset table and override the global weather knob; routes without
    one keep weather=None so the global default applies."""
    from mmfn_tpu.harness.weather import preset_from_params

    xml = """<routes>
      <route id="0" town="Town01">
        <weather cloudiness="80" precipitation="90" sun_altitude_angle="10"/>
        <waypoint x="0" y="0" z="0"/><waypoint x="50" y="0" z="0"/>
      </route>
      <route id="1" town="Town01">
        <waypoint x="0" y="0" z="0"/><waypoint x="50" y="0" z="0"/>
      </route>
      <route id="2" town="Town01">
        <weather cloudiness="85"/>
        <waypoint x="0" y="0" z="0"/><waypoint x="50" y="0" z="0"/>
      </route>
      <route id="3" town="Town01">
        <weather cloudiness="80" precipitation="90"/>
        <weather sun_altitude_angle="10"/>
        <waypoint x="0" y="0" z="0"/><waypoint x="50" y="0" z="0"/>
      </route>
      <route id="4" town="Town01">
        <weather/>
        <waypoint x="0" y="0" z="0"/><waypoint x="50" y="0" z="0"/>
      </route>
    </routes>"""
    p = tmp_path / "weather_routes.xml"
    p.write_text(xml)
    configs = parse_routes_file(str(p))
    assert configs[0].weather == "HardRainSunset"
    assert configs[1].weather is None
    # unset attrs are 0.0 like the reference's zero-initialized
    # WeatherParameters() base — sun at the horizon quantizes to Sunset
    assert configs[2].weather == "CloudySunset"
    # attributes accumulate across ALL <weather> elements, as the reference's
    # RouteParser.parse_weather iterates route.iter('weather')
    assert configs[3].weather == "HardRainSunset"
    # element PRESENCE is the override: an empty <weather/> means the
    # reference's zero-initialized WeatherParameters() (sun at horizon),
    # not "no opinion"
    assert configs[4].weather == "ClearSunset"
    # repetition expansion keeps the per-route weather
    from mmfn_tpu.harness.route import RouteIndexer

    idx = RouteIndexer.from_configs(configs, repetitions=2)
    weathers = [idx.next().weather for _ in range(len(idx))]
    assert weathers.count("HardRainSunset") == 4
    # the quantizer itself covers every family
    assert preset_from_params(precipitation=50) == "MidRainyNoon"
    assert preset_from_params(precipitation=50,
                              sun_altitude_angle=5) == "MidRainSunset"
    assert preset_from_params(precipitation=10) == "SoftRainNoon"
    assert preset_from_params(wetness=60) == "WetNoon"
    assert preset_from_params(precipitation_deposits=60,
                              cloudiness=70) == "WetCloudyNoon"
    assert preset_from_params() == "ClearNoon"


def test_recovery_offset_helpers():
    """collect_offsets: the alternating-and-growing start-offset schedule and
    the lateral shift itself (run_steps phase0 collect + the demo share
    these; reference analog: the expert's long-run steering dither)."""
    from mmfn_tpu.harness.route import collect_offset_for, offset_route_start

    # rep 0 on-lane; alternating sides, growing every full cycle
    assert collect_offset_for(0) == 0.0
    assert collect_offset_for(1) == 0.9
    assert collect_offset_for(2) == -0.9
    assert collect_offset_for(3) == pytest.approx(0.9 * 1.5)
    assert collect_offset_for(4) == pytest.approx(-0.9 * 1.5)

    # heading +x: positive lateral shifts +y; only the first point moves
    traj = [(0.0, 1.75, 0.0), (10.0, 1.75, 0.0), (20.0, 1.75, 0.0)]
    out = offset_route_start(traj, 0.9)
    assert out[0] == pytest.approx((0.0, 2.65, 0.0))
    assert out[1:] == traj[1:]
    # heading -x flips the lateral sign in world frame
    back = offset_route_start([(10.0, 0.0, 0.0), (0.0, 0.0, 0.0)], 0.9)
    assert back[0] == pytest.approx((10.0, -0.9, 0.0))
    # no-ops
    assert offset_route_start(traj, 0.0) == traj
    assert offset_route_start([traj[0]], 1.0) == [traj[0]]
