"""Expert pilot decision tests + dataset writer round-trip."""

import numpy as np
import pytest

from mmfn_tpu.harness.experts import Actor, EgoState, ExpertPilot, WorldView
from mmfn_tpu.harness.experts.pilot import angle_to_target


def _world(speed=5.0, **kw):
    ego = EgoState(position=np.array([0.0, 0.0]),
                   velocity=np.array([speed, 0.0]), yaw=0.0)
    return WorldView(ego=ego, **kw)


def test_angle_to_target():
    assert angle_to_target(np.zeros(2), 0.0, np.array([10.0, 0.0])) == pytest.approx(0.0)
    assert angle_to_target(np.zeros(2), 0.0, np.array([0.0, 10.0])) == pytest.approx(90.0)
    assert angle_to_target(np.zeros(2), np.pi / 2, np.array([0.0, 10.0])) == pytest.approx(0.0)


def test_cruise_straight():
    pilot = ExpertPilot()
    d = pilot.get_control(_world(), np.array([10.0, 0.0]), np.array([50.0, 0.0]))
    assert d.target_speed == ExpertPilot.CRUISE_SPEED
    assert not d.brake
    assert abs(d.steer) < 0.05
    assert d.throttle > 0


def test_slow_in_turns():
    pilot = ExpertPilot()
    d = pilot.get_control(_world(), np.array([10.0, 0.0]), np.array([10.0, 40.0]))
    assert d.target_speed == ExpertPilot.TURN_SPEED


def test_brake_for_lead_vehicle():
    pilot = ExpertPilot()
    lead = Actor(position=np.array([10.0, 0.0]), velocity=np.zeros(2), actor_id=7)
    d = pilot.get_control(_world(vehicles=[lead]),
                          np.array([10.0, 0.0]), np.array([50.0, 0.0]))
    assert d.brake and d.throttle == 0.0
    assert d.hazard == "vehicle:7"


def test_brake_for_walker_and_red_light():
    pilot = ExpertPilot()
    walker = Actor(position=np.array([8.0, 0.5]), velocity=np.zeros(2), actor_id=3)
    d = pilot.get_control(_world(walkers=[walker]),
                          np.array([10.0, 0.0]), np.array([50.0, 0.0]))
    assert d.brake and d.hazard == "walker:3"

    d = pilot.get_control(_world(red_light=True),
                          np.array([10.0, 0.0]), np.array([50.0, 0.0]))
    assert d.brake and d.hazard == "red_light"


def test_stop_sign_released_after_full_stop():
    pilot = ExpertPilot()
    near, far = np.array([10.0, 0.0]), np.array([50.0, 0.0])
    d = pilot.get_control(_world(speed=5.0, stop_sign=True), near, far)
    assert d.brake and d.hazard == "stop_sign"
    # once stopped, the sign is served and the pilot may proceed
    d = pilot.get_control(_world(speed=0.0, stop_sign=True), near, far)
    assert not d.brake


def test_car_following_matches_leader_speed():
    pilot = ExpertPilot()
    leader = Actor(position=np.array([25.0, 0.0]), velocity=np.array([6.0, 0.0]))
    d = pilot.get_control(_world(speed=5.0, car_in_front=leader),
                          np.array([10.0, 0.0]), np.array([50.0, 0.0]))
    assert not d.brake
    assert d.target_speed == pytest.approx(6.0)


def test_dataset_writer_roundtrip(tmp_path):
    from mmfn_tpu.config import GlobalConfig
    from mmfn_tpu.data.dataset import CarlaDataset
    from mmfn_tpu.data.writer import DatasetWriter

    rng = np.random.default_rng(0)
    route = tmp_path / "TownX_short" / "route_00"
    w = DatasetWriter(str(route), image_ext="npy")
    assert not w.should_save(0) and w.should_save(10) and not w.should_save(5)
    for i in range(10):
        w.save_frame(
            rgb_front=rng.integers(0, 255, size=(256, 900, 3)).astype(np.uint8),
            lidar=rng.uniform(-20, 20, size=(200, 4)).astype(np.float32),
            radar=rng.normal(size=(20, 5)).astype(np.float32) + 1,
            vectormap=rng.normal(size=(2, 10, 5)).astype(np.float32),
            map_raster=rng.integers(0, 255, size=(256, 256, 3)).astype(np.uint8),
            x=float(i), y=0.0, theta=0.0, speed=5.0, target_speed=7.0,
            x_command=float(i + 20), y_command=0.0, command=4,
            steer=0.0, throttle=0.5, brake=0.0)
    ds = CarlaDataset([str(tmp_path / "TownX_short")], GlobalConfig(), image_ext="npy")
    assert len(ds) == 4
    sample = ds[0]
    assert sample["image"].shape == (256, 256, 3)
    assert sample["waypoints"].shape == (4, 2)


def test_red_light_pose_straightening():
    """Gated at a red light with the heading >20 deg off the lane: creep at
    0.4 m/s in reverse when nobody is behind, forward when someone is
    (mmfn_pilot.py:142-152, 266-273)."""
    import math

    near, far = np.array([5.0, 0.0]), np.array([50.0, 0.0])
    skewed = EgoState(position=np.zeros(2), velocity=np.zeros(2),
                      yaw=math.radians(30.0))

    d = ExpertPilot().get_control(WorldView(ego=skewed, red_light=True), near, far)
    assert d.reverse and not d.brake
    assert d.target_speed == pytest.approx(0.4)
    assert d.throttle > 0.0

    behind = Actor(position=np.array([-8.0, 0.0]), velocity=np.zeros(2))
    d2 = ExpertPilot().get_control(
        WorldView(ego=skewed, red_light=True, cars_behind=[behind]), near, far)
    assert not d2.reverse and not d2.brake
    assert d2.target_speed == pytest.approx(0.4)

    # aligned ego: plain red-light braking, no maneuver
    aligned = EgoState(position=np.zeros(2), velocity=np.zeros(2), yaw=0.0)
    d3 = ExpertPilot().get_control(WorldView(ego=aligned, red_light=True), near, far)
    assert d3.brake and not d3.reverse


def test_kinematic_world_reverse_gear():
    from mmfn_tpu.harness.agents.base import VehicleControl
    from mmfn_tpu.harness.replay import KinematicWorld

    world = KinematicWorld("<OpenDRIVE/>", (0.0, 0.0, 0.0))
    for _ in range(40):
        world.tick(VehicleControl(throttle=0.5, reverse=True))
    assert world.v < 0.0 and world.v >= -3.0
    assert world.x < -0.1                       # moved backwards
    for _ in range(40):
        world.tick(VehicleControl(brake=1.0, reverse=True))
    assert world.v == pytest.approx(0.0, abs=1e-6)


def test_change_lane_hazard_and_patience():
    """A moving vehicle in the merge-target lane gates the lane change
    (mmfn_pilot.py:_is_change_lane); a slow blocker only holds the ego for
    CHANGE_LANE_PATIENCE decisions before the wait is abandoned
    (mmfn_pilot.py:127-140)."""
    near, far = np.array([6.0, -3.5]), np.array([30.0, -3.5])

    def world_with(blocker_speed):
        # beside-and-slightly-ahead in the adjacent lane: outside the forward
        # proximity cone (60 deg) and both TTC gates (lateral 3.5 m), so only
        # the change-lane rule can fire
        ego = EgoState(position=np.zeros(2), velocity=np.array([3.0, 0.0]),
                       yaw=0.0, lane_id=1)
        blocker = Actor(position=np.array([2.0, -3.5]),
                        velocity=np.array([blocker_speed, 0.0]),
                        yaw=0.0, lane_id=2, actor_id=42)
        return WorldView(ego=ego, vehicles=[blocker],
                         lane_change_required=True, change_lane_ids=[2])

    pilot = ExpertPilot()
    d = pilot.get_control(world_with(3.0), near, far)
    assert d.hazard == "change_lane:42" and d.brake

    # parked car in the target lane outside a junction: not merging traffic
    d2 = ExpertPilot().get_control(world_with(0.0), near, far)
    assert d2.hazard is None

    # slow (but moving) blocker: brake at first, give up after the patience
    pilot3 = ExpertPilot()
    last = None
    for _ in range(pilot3.CHANGE_LANE_PATIENCE + 3):
        last = pilot3.get_control(world_with(0.5), near, far)
    assert not last.brake and last.hazard is None

    # vehicle in the ego's own lane id never triggers the merge gate
    ego = EgoState(position=np.zeros(2), velocity=np.array([3.0, 0.0]),
                   yaw=0.0, lane_id=1)
    same_lane = Actor(position=np.array([40.0, 0.0]),
                      velocity=np.array([3.0, 0.0]), yaw=0.0, lane_id=1)
    w = WorldView(ego=ego, vehicles=[same_lane],
                  lane_change_required=True, change_lane_ids=[2])
    assert ExpertPilot()._change_lane_hazard(w) is None
