"""Tests for the PID controller, route planner, hazard geometry, and RoughMap."""

import math

import numpy as np
import pytest

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.control import PIDController, WaypointController, RoutePlanner, gps_to_location
from mmfn_tpu.control.planner import location_to_gps
from mmfn_tpu.control.geometry import segment_intersection, ttc_projection, ttc_disc
from mmfn_tpu.mapping import RoughMap, write_rmap


# ---------------------------- PID --------------------------------------- #

def test_pid_matches_reference_formula():
    pid = PIDController(k_p=1.0, k_i=0.65, k_d=0.2, n=4)
    errors = [0.5, -0.2, 0.3]
    window = [0.0, 0.0, 0.0, 0.0]
    for e in errors:
        window = window[1:] + [e]
        want = 1.0 * e + 0.65 * np.mean(window) + 0.2 * (window[-1] - window[-2])
        assert pid.step(e) == pytest.approx(want)


def test_control_pid_semantics():
    cfg = GlobalConfig()
    ctrl = WaypointController(cfg)
    # straight-ahead waypoints (model y is forward-negative)
    wps = np.array([[0.0, -1.0], [0.0, -2.0], [0.0, -3.0], [0.0, -4.0]])
    steer, throttle, brake, meta = ctrl.control_pid(wps, speed=1.0)
    assert not brake
    assert meta["desired_speed"] == pytest.approx(2.0)
    assert steer == pytest.approx(0.0, abs=1e-6)
    assert 0.0 < throttle <= cfg.max_throttle

    # stationary target -> brake
    ctrl2 = WaypointController(cfg)
    wps0 = np.zeros((4, 2))
    _, throttle0, brake0, _ = ctrl2.control_pid(wps0, speed=5.0)
    assert brake0 and throttle0 == 0.0


# ---------------------------- planner ------------------------------------ #

def test_gps_roundtrip():
    lat, lon, _ = location_to_gps(123.4, -56.7)
    x, y, _ = gps_to_location(lat, lon)
    assert x == pytest.approx(123.4, abs=1e-6)
    assert y == pytest.approx(-56.7, abs=1e-6)


def test_route_planner_pops_passed_waypoints():
    plan = [(np.array([float(i * 10), 0.0]), "LANEFOLLOW") for i in range(6)]
    rp = RoutePlanner(min_distance=7.5, max_distance=200.0)
    rp.set_route(plan)
    target, _ = rp.run_step(np.array([0.0, 0.0]))
    np.testing.assert_allclose(target, [10.0, 0.0])
    # move near waypoint 2 (20, 0): wp at distance <=7.5 gets popped
    target, _ = rp.run_step(np.array([18.0, 0.0]))
    np.testing.assert_allclose(target, [30.0, 0.0])


# ---------------------------- geometry ----------------------------------- #

def test_ttc_projection_head_on():
    # ego at origin moving +x at 10; obstacle 50 m ahead, stationary
    t = ttc_projection(np.array([0.0, 0.0]), np.array([50.0, 0.0]),
                       np.array([10.0, 0.0]), np.array([0.0, 0.0]), close_dis=2.0)
    assert t == pytest.approx(5.0)
    # diverging
    t = ttc_projection(np.array([0.0, 0.0]), np.array([50.0, 0.0]),
                       np.array([-10.0, 0.0]), np.array([0.0, 0.0]), close_dis=2.0)
    assert t == 999.0
    # lateral miss beyond gate
    t = ttc_projection(np.array([0.0, 0.0]), np.array([50.0, 10.0]),
                       np.array([10.0, 0.0]), np.array([0.0, 0.0]), close_dis=2.0)
    assert t == 999.0


def test_ttc_disc():
    t = ttc_disc(np.array([0.0, 0.0]), np.array([13.0, 0.0]),
                 np.array([10.0, 0.0]), np.array([0.0, 0.0]))
    assert t == pytest.approx(1.0)  # closes 13 m - 3 m radii sum at 10 m/s
    assert ttc_disc(np.zeros(2), np.array([2.0, 0.0]), np.array([1.0, 0]), np.zeros(2)) == 0.0


def test_segment_intersection():
    hit, pt = segment_intersection(np.array([0.0, 0.0]), np.array([2.0, 2.0]),
                                   np.array([0.0, 2.0]), np.array([2.0, -2.0]))
    assert hit
    np.testing.assert_allclose(pt, [1.0, 1.0])
    hit, _ = segment_intersection(np.array([0.0, 0.0]), np.array([1.0, 0.0]),
                                  np.array([0.0, 1.0]), np.array([1.0, 0.0]))
    assert not hit


# ---------------------------- RoughMap ----------------------------------- #

def _straight_lane(x0, y0, dx, dy, n=10, attrs=(0.0, 0.0, 0.0)):
    nodes = np.array([[x0 + i * dx, y0 + i * dy, *attrs] for i in range(n)])
    xs, ys = nodes[:, 0], nodes[:, 1]
    polygon = np.array([[xs.min() - 2, ys.min() - 2], [xs.max() + 2, ys.min() - 2],
                        [xs.max() + 2, ys.max() + 2], [xs.min() - 2, ys.max() + 2]])
    return polygon, nodes


def test_rmap_roundtrip_and_crop(tmp_path):
    lanes = [
        _straight_lane(0, 0, 5, 0),          # along +x through origin
        _straight_lane(1000, 1000, 5, 0),    # far away
        _straight_lane(0, 10, 5, 0, n=4),    # near, short (needs padding)
    ]
    path = str(tmp_path / "a.rmap")
    write_rmap(path, lanes)

    rmap = RoughMap(up=28, down=28, left=28, right=28, lane_node_num=10, feature_num=5)
    rmap.read(path)
    assert len(rmap.lanes) == 3

    out = rmap.process([0.0, 0.0, 0.0])
    assert out.shape == (2, 10, 5)           # far lane excluded
    # identity pose: first lane nodes unchanged
    np.testing.assert_allclose(out[0, :, :2], lanes[0][1][:, :2])
    # short lane zero-padded
    assert np.all(out[1, 4:, :] == 0)

    # rotated pose: nodes must appear in ego frame
    theta = math.pi / 2
    out = rmap.process([0.0, 0.0, theta])
    # world point (5,0) seen from pose (0,0,90deg) -> R(-90)(5,0) = (0,-5)
    np.testing.assert_allclose(out[0, 1, :2], [0.0, -5.0], atol=1e-9)

    # padded variant
    padded, n = rmap.process_padded([0.0, 0.0, 0.0], max_lanes=8)
    assert padded.shape == (8, 10, 5) and n == 2
    assert np.all(padded[2:] == 0)

    # empty crop -> zero lane fallback
    padded, n = rmap.process_padded([5000.0, 5000.0, 0.0], max_lanes=8)
    assert n == 1 and np.all(padded == 0)


def test_rmap_crop_rotation_of_query_box(tmp_path):
    # lane 40 m ahead in +x: inside the 28 m box only when the box is rotated
    # toward it... actually outside for identity pose (up=28 < 40-2)
    lanes = [_straight_lane(40, 0, 1, 0, n=5)]
    path = str(tmp_path / "b.rmap")
    write_rmap(path, lanes)
    rmap = RoughMap().read(path)
    assert rmap.process([0.0, 0.0, 0.0]).shape[0] == 0
    # moving the pose closer brings it in range
    assert rmap.process([15.0, 0.0, 0.0]).shape[0] == 1
