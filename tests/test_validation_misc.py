"""Sensor validation, game time, result writer, carla_glue import guard."""

import pytest

from mmfn_tpu.harness.agents.base import Track
from mmfn_tpu.harness.agents.e2e import MMFNAgent
from mmfn_tpu.harness.game_time import GameTime
from mmfn_tpu.harness.result_writer import format_global_summary, format_route_record
from mmfn_tpu.harness.sensor_interface import SensorConfigurationInvalid
from mmfn_tpu.harness.statistics import RouteRecord
from mmfn_tpu.harness.validation import validate_sensor_configuration


def _mmfn_sensor_suite():
    # the MMFN agents' suite without instantiating a model
    return MMFNAgent.sensors(object.__new__(MMFNAgent))


def test_mmfn_suite_valid_on_map_track():
    validate_sensor_configuration(_mmfn_sensor_suite(), Track.MAP, Track.MAP)


def test_opendrive_rejected_on_sensors_track():
    with pytest.raises(SensorConfigurationInvalid):
        validate_sensor_configuration(_mmfn_sensor_suite(), Track.SENSORS, Track.SENSORS)


def test_wrong_track_rejected():
    with pytest.raises(SensorConfigurationInvalid):
        validate_sensor_configuration(_mmfn_sensor_suite(), Track.MAP, Track.SENSORS)


def test_limits_and_radius():
    too_many = [{"type": "sensor.lidar.ray_cast", "id": f"l{i}",
                 "x": 0, "y": 0, "z": 0} for i in range(2)]
    with pytest.raises(SensorConfigurationInvalid):
        validate_sensor_configuration(too_many, Track.MAP, Track.MAP)

    far = [{"type": "sensor.camera.rgb", "id": "c", "x": 5.0, "y": 0, "z": 0,
            "width": 100, "height": 100, "fov": 90}]
    with pytest.raises(SensorConfigurationInvalid):
        validate_sensor_configuration(far, Track.MAP, Track.MAP)

    dup = [{"type": "sensor.other.imu", "id": "a", "x": 0, "y": 0, "z": 0},
           {"type": "sensor.other.gnss", "id": "a", "x": 0, "y": 0, "z": 0}]
    with pytest.raises(SensorConfigurationInvalid):
        validate_sensor_configuration(dup, Track.MAP, Track.MAP)


def test_game_time():
    GameTime.restart()
    GameTime.on_carla_tick((5, 0.25))
    GameTime.on_carla_tick((6, 0.30))
    GameTime.on_carla_tick((6, 0.35))  # stale frame ignored
    assert GameTime.get_time() == pytest.approx(0.30)
    assert GameTime.get_frame() == 6
    GameTime.restart()
    assert GameTime.get_time() == 0.0


def test_result_writer_tables():
    r = RouteRecord()
    r.route_id = "7"
    r.status = "Completed"
    r.scores = {"score_route": 100.0, "score_penalty": 0.7, "score_composed": 70.0}
    r.infractions["red_light"].append("ran a light")
    out = format_route_record(r)
    assert "Driving score" in out and "70.000" in out
    assert "Red lights infractions" in out
    summary = format_global_summary([r])
    assert "route" in summary and "Completed" in summary


def test_carla_glue_imports_without_carla():
    import mmfn_tpu.harness.carla_glue as glue

    assert glue.HAS_CARLA is False
    with pytest.raises(RuntimeError):
        glue.run_carla_evaluation({}, None, None, None, None)


def test_seed_everything_deterministic():
    import random
    import numpy as np
    from mmfn_tpu.utils.seeding import seed_everything

    key1 = seed_everything(42)
    a = (random.random(), np.random.rand())
    key2 = seed_everything(42)
    b = (random.random(), np.random.rand())
    assert a == b
    assert (key1 == key2).all()
