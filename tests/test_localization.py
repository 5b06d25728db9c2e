"""Localization tests: quaternion conventions and EKF tracking."""

import math

import numpy as np
import pytest

from mmfn_tpu.control.localization import (
    IMUReading, LocalizationOperator, Pose, Quaternion, Rotation, compass_to_yaw)


def test_quaternion_euler_roundtrip():
    for pitch, yaw, roll in [(10, 45, -20), (0, 90, 0), (-30, 170, 15)]:
        q = Quaternion.from_rotation(Rotation(pitch=pitch, yaw=yaw, roll=roll))
        r = q.as_rotation()
        assert r.pitch == pytest.approx(pitch, abs=1e-6)
        assert r.yaw == pytest.approx(yaw, abs=1e-6)
        assert r.roll == pytest.approx(roll, abs=1e-6)


def test_quaternion_yaw_matrix():
    # pure yaw: body +X maps to world (cos, sin, 0)... with UE sign conventions
    q = Quaternion.from_rotation(Rotation(yaw=90.0))
    v = q.matrix @ np.array([1.0, 0.0, 0.0])
    # 90-degree yaw maps +X to +Y (per the pylot Rotation docstring)
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-9)


def test_angular_velocity_integration():
    # integrate a constant yaw rate: 90 deg/s for 1 s
    q0 = Quaternion.from_rotation(Rotation())
    dq = Quaternion.from_angular_velocity(np.array([0.0, 0.0, math.pi / 2]), 1.0)
    yaw = (q0 * dq).as_rotation().yaw
    assert yaw == pytest.approx(90.0, abs=1e-6)


def test_compass_to_yaw():
    assert compass_to_yaw(math.radians(90.0)) == pytest.approx(0.0)
    assert compass_to_yaw(math.radians(300.0)) == pytest.approx(-150.0)
    assert compass_to_yaw(float("nan"), last_yaw=33.0) == 33.0


def test_ekf_smooths_noisy_gnss():
    """Constant-velocity motion with noisy GNSS: the EKF estimate must track
    truth and beat the raw GNSS noise level."""
    rng = np.random.default_rng(0)
    op = LocalizationOperator(var_gnss=1.0)
    dt = 0.05
    speed = 10.0  # along +x
    errs_ekf, errs_raw = [], []
    for i in range(200):
        t = i * dt
        truth = np.array([speed * t, 0.0, 0.0])
        gnss = truth + rng.normal(scale=0.8, size=3)
        imu = IMUReading(accelerometer=np.array([0.0, 0.0, 9.81]),
                         gyroscope=np.zeros(3), compass=math.pi / 2, timestamp=t)
        pose = op.update_pose(gnss, speed, imu, yaw_deg=0.0,
                              rotation=Rotation(), use_ekf=True)
        if i > 50:  # after convergence
            errs_ekf.append(np.linalg.norm(pose.location[:2] - truth[:2]))
            errs_raw.append(np.linalg.norm(gnss[:2] - truth[:2]))
    assert np.mean(errs_ekf) < 0.7 * np.mean(errs_raw)
    assert np.mean(errs_ekf) < 1.0
