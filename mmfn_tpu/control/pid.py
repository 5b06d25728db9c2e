"""Waypoint-following PID control (host-side, 20 Hz scalar state).

Reference: the windowed PID (model_img.py:426-448) and ``MMFN.control_pid``
(model_img.py:509-550). These run per-tick on scalars with deque state, so
they stay on the host — only the waypoint tensor crosses the device boundary.
"""

from __future__ import annotations

from collections import deque
from typing import Tuple

import numpy as np

from mmfn_tpu.config import GlobalConfig


class PIDController:
    """P + I(window mean) + D(last difference) with a fixed-length window."""

    def __init__(self, k_p: float = 1.0, k_i: float = 0.0, k_d: float = 0.0, n: int = 20):
        self.k_p, self.k_i, self.k_d = k_p, k_i, k_d
        self._window = deque([0.0] * n, maxlen=n)

    def step(self, error: float) -> float:
        self._window.append(error)
        if len(self._window) >= 2:
            integral = float(np.mean(self._window))
            derivative = self._window[-1] - self._window[-2]
        else:
            integral = derivative = 0.0
        return self.k_p * error + self.k_i * integral + self.k_d * derivative

    def reset(self) -> None:
        self._window.extend([0.0] * self._window.maxlen)


class WaypointController:
    """Converts predicted waypoints + current speed into steer/throttle/brake.

    Matches MMFN.control_pid exactly: desired speed from the first segment
    length x2; steering from the angle to the midpoint of the first two
    waypoints; brake when (nearly) stopped or overspeeding.
    """

    def __init__(self, config: GlobalConfig):
        self.config = config
        self.turn_controller = PIDController(config.turn_KP, config.turn_KI,
                                             config.turn_KD, config.turn_n)
        self.speed_controller = PIDController(config.speed_KP, config.speed_KI,
                                              config.speed_KD, config.speed_n)

    def control_pid(self, waypoints: np.ndarray, speed: float) -> Tuple[float, float, bool, dict]:
        """waypoints: (pred_len, 2) in ego frame (y forward-negative); speed m/s."""
        cfg = self.config
        waypoints = np.array(waypoints, dtype=np.float64, copy=True)
        waypoints[:, 1] *= -1  # flip: forward is negative in model output space
        speed = float(speed)

        desired_speed = float(np.linalg.norm(waypoints[0] - waypoints[1]) * 2.0)
        brake = desired_speed < cfg.brake_speed or (speed / desired_speed) > cfg.brake_ratio

        aim = (waypoints[1] + waypoints[0]) / 2.0
        angle = float(np.degrees(np.pi / 2 - np.arctan2(aim[1], aim[0])) / 90.0)
        if speed < 0.01:
            angle = 0.0  # don't accumulate integral error while stopped
        steer = float(np.clip(self.turn_controller.step(angle), -1.0, 1.0))

        delta = float(np.clip(desired_speed - speed, 0.0, cfg.clip_delta))
        throttle = float(np.clip(self.speed_controller.step(delta), 0.0, cfg.max_throttle))
        throttle = 0.0 if brake else throttle

        metadata = {
            "speed": speed, "steer": steer, "throttle": throttle, "brake": bool(brake),
            "wp_2": tuple(waypoints[1]), "wp_1": tuple(waypoints[0]),
            "desired_speed": desired_speed, "angle": angle,
            "aim": tuple(aim), "delta": delta,
        }
        return steer, throttle, bool(brake), metadata
