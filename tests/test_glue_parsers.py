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
