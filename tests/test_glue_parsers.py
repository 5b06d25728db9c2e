"""CARLA-glue raw-buffer parsers and pseudo-sensors, tested with mocks
(no carla needed: the parsers only touch .raw_data / scalar attributes)."""

import math
import time
from types import SimpleNamespace

import numpy as np
import pytest

from mmfn_tpu.harness import carla_glue as glue
from mmfn_tpu.harness.game_time import GameTime
from mmfn_tpu.harness.sensor_interface import SensorInterface


def test_parse_image():
    raw = np.arange(2 * 3 * 4, dtype=np.uint8).tobytes()
    img = glue.parse_image(SimpleNamespace(raw_data=raw, height=2, width=3))
    assert img.shape == (2, 3, 4)
    assert img[0, 0, 0] == 0 and img[1, 2, 3] == 23


def test_parse_lidar():
    pts = np.arange(8, dtype=np.float32)
    out = glue.parse_lidar(SimpleNamespace(raw_data=pts.tobytes()))
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[1], [4, 5, 6, 7])


def test_parse_radar_flips_to_vel_alt_azi_depth():
    # carla RadarDetection order: [depth, azimuth, altitude, velocity]
    pts = np.array([[10.0, 0.1, 0.2, 5.0]], dtype=np.float32)
    out = glue.parse_radar(SimpleNamespace(raw_data=pts.tobytes()))
    np.testing.assert_allclose(out[0], [5.0, 0.2, 0.1, 10.0])


def test_parse_gnss_imu():
    g = glue.parse_gnss(SimpleNamespace(latitude=1.0, longitude=2.0, altitude=3.0))
    np.testing.assert_allclose(g, [1, 2, 3])
    imu = glue.parse_imu(SimpleNamespace(
        accelerometer=SimpleNamespace(x=1, y=2, z=3),
        gyroscope=SimpleNamespace(x=4, y=5, z=6), compass=0.5))
    np.testing.assert_allclose(imu, [1, 2, 3, 4, 5, 6, 0.5])


def test_callback_routes_into_interface():
    si = SensorInterface()
    si.register_sensor("lidar")
    cb = glue._Callback("lidar", "sensor.lidar.ray_cast", si)
    pts = np.ones(4, dtype=np.float32)
    cb(SimpleNamespace(raw_data=pts.tobytes(), frame=7))
    data = si.get_data()
    assert data["lidar"][0] == 7
    assert data["lidar"][1].shape == (1, 4)


def test_speedometer_reader_forward_speed():
    GameTime.restart()
    si = SensorInterface()
    si.register_sensor("speed")
    vehicle = SimpleNamespace(
        get_velocity=lambda: SimpleNamespace(x=3.0, y=4.0, z=0.0),
        get_transform=lambda: SimpleNamespace(
            rotation=SimpleNamespace(yaw=math.degrees(math.atan2(4, 3)), pitch=0.0)))
    reader = glue.SpeedometerReader(vehicle, "speed", si, reading_frequency=20)
    GameTime.on_carla_tick((1, 0.05))
    try:
        data = si.get_data()
        assert data["speed"][1]["speed"] == pytest.approx(5.0, abs=1e-6)
    finally:
        reader.stop()
        time.sleep(0.01)


def test_world_view_from_carla_stop_sign_detection():
    """Stop-sign gating via trigger-volume distance + forward cone
    (glue port of MapAgent.get_nearby_lights, map_agent.py:38-76)."""
    import math

    from mmfn_tpu.harness.carla_glue import world_view_from_carla

    class Vec:
        def __init__(self, x, y, z=0.0):
            self.x, self.y, self.z = x, y, z

    class Rot:
        def __init__(self, yaw):
            self.yaw = yaw

    class Transform:
        def __init__(self, x, y, yaw=0.0):
            self.location, self.rotation = Vec(x, y), Rot(yaw)

        def transform(self, loc):
            c, s = math.cos(math.radians(self.rotation.yaw)), \
                math.sin(math.radians(self.rotation.yaw))
            return Vec(self.location.x + c * loc.x - s * loc.y,
                       self.location.y + s * loc.x + c * loc.y)

    class Ego:
        id = 1

        def get_transform(self):
            return Transform(0.0, 0.0, 0.0)

        def get_velocity(self):
            return Vec(5.0, 0.0)

        def is_at_traffic_light(self):
            return False

    class StopActor:
        id = 2
        type_id = "traffic.stop"

        def __init__(self, x, y):
            self._tf = Transform(x, y, 0.0)
            self.trigger_volume = type("TV", (), {"location": Vec(0.0, 0.0)})()

        def get_transform(self):
            return self._tf

    class Actors(list):
        def filter(self, pattern):
            key = pattern.strip("*")
            return [a for a in self if key in a.type_id]

    class World:
        def __init__(self, actors):
            self._actors = Actors(actors)

        def get_actors(self):
            return self._actors

    # sign 8 m ahead in the cone -> gates
    view = world_view_from_carla(World([StopActor(8.0, 0.0)]), Ego())
    assert view.stop_sign and not view.red_light
    # sign behind -> ignored
    view = world_view_from_carla(World([StopActor(-8.0, 0.0)]), Ego())
    assert not view.stop_sign
    # sign too far -> ignored
    view = world_view_from_carla(World([StopActor(40.0, 0.0)]), Ego())
    assert not view.stop_sign


def test_gps_mercator_roundtrip():
    """gps_to_location inverts location_to_gps for a nonzero georeference."""
    from mmfn_tpu.control.planner import gps_to_location, location_to_gps

    lat_ref, lon_ref = 49.0, 8.0
    for x, y in ((0.0, 0.0), (123.4, -56.7), (-400.0, 250.0)):
        lat, lon, z = location_to_gps(x, y, 1.5, lat_ref, lon_ref)
        gx, gy, gz = gps_to_location(lat, lon, z, lat_ref, lon_ref)
        np.testing.assert_allclose((gx, gy, gz), (x, y, 1.5), atol=1e-6)


def test_linear_gnss_parser_world_frame():
    """The glue's GNSS parser decodes mercator readings back to the world
    frame and re-encodes them with the linear convention agents decode — so
    decoded positions == CARLA world (x, y), the .rmap lane frame."""
    from mmfn_tpu.control.planner import GPS_SCALE, location_to_gps

    lat_ref, lon_ref = 42.0, 2.0
    x, y = 210.5, -87.25
    lat, lon, _ = location_to_gps(x, y, 0.0, lat_ref, lon_ref)
    parser = glue._LinearGnssParser(lat_ref, lon_ref)
    out = parser(SimpleNamespace(latitude=lat, longitude=lon, altitude=0.0))
    np.testing.assert_allclose(out[0] * GPS_SCALE[0], x, atol=1e-5)
    np.testing.assert_allclose(out[1] * GPS_SCALE[1], y, atol=1e-5)


def test_latlon_ref_from_opendrive():
    xodr = """<?xml version="1.0"?><OpenDRIVE><header>
    <geoReference><![CDATA[+proj=tmerc +lat_0=49.5 +lon_0=8.25 +k=1]]></geoReference>
    </header></OpenDRIVE>"""
    assert glue.latlon_ref_from_opendrive(xodr) == (49.5, 8.25)
    assert glue.latlon_ref_from_opendrive("<OpenDRIVE/>") == (42.0, 2.0)


def test_parse_imu_world_yaw():
    data = SimpleNamespace(
        accelerometer=SimpleNamespace(x=1.0, y=2.0, z=3.0),
        gyroscope=SimpleNamespace(x=0.1, y=0.2, z=0.3),
        compass=9.9,
        transform=SimpleNamespace(rotation=SimpleNamespace(yaw=90.0)))
    out = glue.parse_imu_world_yaw(data)
    np.testing.assert_allclose(out[6], math.pi / 2)
    np.testing.assert_allclose(out[:6], [1, 2, 3, 0.1, 0.2, 0.3])
