"""Background NPC traffic (the reference's background_activity analog,
route_scenario.py:444-475): lane following, headway, red lights, scoring."""


import numpy as np

from mmfn_tpu.harness.npc_traffic import BackgroundTraffic, MIN_SPAWN_GAP, _Npc
from mmfn_tpu.harness.traffic import SignalSet, TrafficLight

DT = 0.05


def straight_lane(length=200.0, y=1.75, spacing=5.0):
    xs = np.arange(0.0, length + spacing, spacing)
    return np.stack([xs, np.full_like(xs, y)], axis=1)


def test_spawn_deterministic_spaced_and_clear_of_ego():
    lane = straight_lane()
    a = BackgroundTraffic([lane], amount=6, seed=3, ego_start=(0.0, 1.75))
    b = BackgroundTraffic([lane], amount=6, seed=3, ego_start=(0.0, 1.75))
    assert a.population == 6
    assert [n.s for n in a.npcs] == [n.s for n in b.npcs]     # deterministic
    ss = sorted(n.s for n in a.npcs)
    assert all(s2 - s1 >= MIN_SPAWN_GAP for s1, s2 in zip(ss, ss[1:]))
    far = np.array([1000.0, 1000.0])
    for actor in a.tick(far, 0.0, DT):
        assert np.linalg.norm(actor.position - np.array([0.0, 1.75])) >= 15.0


def test_npcs_follow_lane_and_population_is_constant():
    lane = straight_lane(length=100.0)
    bg = BackgroundTraffic([lane], amount=4, seed=0)
    far = np.array([1000.0, 1000.0])
    for _ in range(1200):   # 60 s: everyone reaches the end and respawns
        actors = bg.tick(far, 0.0, DT)
    assert bg.population == 4
    assert len(actors) == 4
    for a in actors:
        assert abs(a.position[1] - 1.75) < 1e-6          # on the polyline
        assert 0.0 <= a.position[0] <= 100.0
        assert np.linalg.norm(a.velocity) > 1.0          # cruising


def test_headway_follower_never_rear_ends_leader():
    lane = straight_lane(length=300.0)
    bg = BackgroundTraffic([lane], amount=0, seed=0)
    leader = _Npc(0, 60.0, cruise=0.01, actor_id=5000)   # effectively parked
    follower = _Npc(0, 30.0, cruise=7.0, actor_id=5001)
    bg.npcs = [leader, follower]
    far = np.array([1000.0, 1000.0])
    min_gap = np.inf
    for _ in range(400):
        bg.tick(far, 0.0, DT)
        min_gap = min(min_gap, leader.s - follower.s)
    assert min_gap > 4.0                                  # never overlapping
    assert follower.speed < 0.5                           # settled behind


def test_npc_stops_behind_ego():
    lane = straight_lane(length=300.0)
    bg = BackgroundTraffic([lane], amount=0, seed=0)
    bg.npcs = [_Npc(0, 10.0, cruise=7.0, actor_id=5000)]
    ego = np.array([40.0, 1.75])
    for _ in range(400):
        actors = bg.tick(ego, 0.0, DT)
    gap = ego[0] - actors[0].position[0]
    assert gap > 4.0
    assert np.linalg.norm(actors[0].velocity) < 0.5


def test_npc_brakes_for_red_light():
    lane = straight_lane(length=300.0)
    # always-red light at x=80 governing +x travel
    light = TrafficLight(position=np.array([80.0, 1.75]), yaw=0.0,
                         green=0.0, yellow=0.0, red=10.0)
    bg = BackgroundTraffic([lane], amount=0, seed=0,
                           signals=SignalSet(lights=[light]))
    bg.npcs = [_Npc(0, 40.0, cruise=7.0, actor_id=5000)]
    far = np.array([1000.0, 1000.0])
    t = 0.0
    for _ in range(600):
        actors = bg.tick(far, 0.0, DT, game_time=t)
        t += DT
    assert actors[0].position[0] < 80.5                    # held at the line
    assert np.linalg.norm(actors[0].velocity) < 0.5


def test_remove_near_retires_blockers():
    lane = straight_lane()
    bg = BackgroundTraffic([lane], amount=0, seed=0)
    bg.npcs = [_Npc(0, 50.0, 5.0, 5000), _Npc(0, 120.0, 5.0, 5001)]
    assert bg.remove_near(np.array([52.0, 1.75]), radius=15.0) == 1
    assert bg.population == 1


def test_short_and_degenerate_lanes_are_skipped():
    tiny = straight_lane(length=5.0)
    single = np.array([[0.0, 0.0]])
    bg = BackgroundTraffic([tiny, single], amount=3, seed=0)
    assert bg.population == 0
    assert bg.tick(np.zeros(2), 0.0, DT) == []


# ---- closed-loop integration (expert among traffic) ----------------------- #

def test_expert_drives_among_background_traffic(tool, tmp_path):
    from mmfn_tpu.config import GlobalConfig
    from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent
    from mmfn_tpu.harness.replay import ClosedLoopRunner
    from mmfn_tpu.harness.route import RouteConfig
    from mmfn_tpu.mapping import RoughMap, build_rmap
    from tests.test_harness import STRAIGHT_XODR

    map_dir = tmp_path / "map" / "opendrive"
    map_dir.mkdir(parents=True)
    (map_dir / "opstr.txt").write_text(STRAIGHT_XODR)
    assert not build_rmap([str(map_dir)], tool_path=tool)
    rough_map = RoughMap().read(str(map_dir / "a.rmap"))

    bg = BackgroundTraffic([lane.nodes for lane in rough_map.lanes],
                           amount=3, seed=1, ego_start=(0.0, 1.75))
    assert bg.population > 0
    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (120.0, 1.75, 0.0)],
                         index=0)
    agent = ExpertCollectionAgent({
        "rmap_tool": tool, "tmp_dir": str(tmp_path / "agent_map"),
        "config": GlobalConfig()})
    record = ClosedLoopRunner(max_wall_seconds=60).run_route(
        agent, config, STRAIGHT_XODR, background=bg)
    # the expert keeps headway: no vehicle collisions among traffic
    assert len(record.infractions["collisions_vehicle"]) == 0, record.to_dict()


def test_npcs_travel_in_lane_direction_on_two_lane_road(tool, tmp_path):
    """Left-lane (positive id) polylines come out of the vectorizer in
    direction of travel, so NPCs on a two-way road drive WITH their lane,
    never head-on (regression: demo route 3 collision)."""
    from mmfn_tpu.mapping import RoughMap, build_rmap

    two_lane = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE><header revMajor="1" revMinor="4" name="line"/>
<road name="R0" length="200.0" id="0" junction="-1">
<planView><geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="200.0"><line/></geometry></planView>
<lanes><laneSection s="0.0"><center><lane id="0" type="none" level="false"/></center>
<right><lane id="-1" type="driving" level="false"><width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/></lane></right>
<left><lane id="1" type="driving" level="false"><width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/></lane></left>
</laneSection></lanes></road></OpenDRIVE>
"""
    map_dir = tmp_path / "two" / "opendrive"
    map_dir.mkdir(parents=True)
    (map_dir / "opstr.txt").write_text(two_lane)
    assert not build_rmap([str(map_dir)], tool_path=tool)
    rm = RoughMap().read(str(map_dir / "a.rmap"))

    for lane in rm.lanes:
        dx = np.diff(lane.nodes[:, 0])
        y = np.median(lane.nodes[:, 1])
        if y > 0:         # right lane (xodr t<0 -> CARLA +y): travels +x
            assert np.all(dx > 0), lane.nodes[:, :2]
        else:             # left lane: travels -x
            assert np.all(dx < 0), lane.nodes[:, :2]

    # NPCs spawned on those lanes keep each lane's direction
    bg = BackgroundTraffic([l.nodes for l in rm.lanes], amount=8, seed=0)
    for _ in range(100):
        actors = bg.tick(np.array([1000.0, 1000.0]), 0.0, DT)
    for a in actors:
        if np.linalg.norm(a.velocity) < 0.5:
            continue
        if a.position[1] > 0:
            assert a.velocity[0] > 0
        else:
            assert a.velocity[0] < 0


def test_oriented_box_collision():
    """Box collision: adjacent-lane passes (3.5 m) are clean, real rear-ends
    and crossing overlaps register (circle tests cannot do both)."""
    from mmfn_tpu.harness.scenarios import ScenarioActor, check_collision

    def car(x, y, yaw=0.0, aid=1):
        return ScenarioActor("vehicle", np.array([x, y], dtype=float),
                             np.zeros(2), yaw=yaw, extent=2.2, actor_id=aid)

    ego = np.array([0.0, 0.0])
    # oncoming car one lane over: no collision
    assert check_collision(ego, 0.0, [car(0.0, 3.5, yaw=np.pi)]) is None
    # side-by-side in the adjacent lane: no collision
    assert check_collision(ego, 0.0, [car(1.5, 3.5)]) is None
    # rear-end: bumper overlap at 4 m center distance, same lane
    assert check_collision(ego, 0.0, [car(4.0, 0.0)]) is not None
    # clear gap ahead: 5.5 m centers is daylight
    assert check_collision(ego, 0.0, [car(5.5, 0.0)]) is None
    # perpendicular crossing vehicle overlapping the ego's nose
    assert check_collision(ego, 0.0, [car(2.5, 0.5, yaw=np.pi / 2)]) is not None
    # walker brushing the ego's side
    walker = ScenarioActor("walker", np.array([0.0, 1.4]), np.zeros(2),
                           extent=0.5, actor_id=9)
    assert check_collision(ego, 0.0, [walker]) is not None
    walker_far = ScenarioActor("walker", np.array([0.0, 2.0]), np.zeros(2),
                               extent=0.5, actor_id=9)
    assert check_collision(ego, 0.0, [walker_far]) is None
