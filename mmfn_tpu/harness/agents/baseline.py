"""Closed-loop agents for the benchmark baselines
(team_code/e2e_agent/{aim,cilrs,transfuser}_agent.py analogs).

- 'aim':        camera + target point -> waypoints -> PID
- 'transfuser': camera + two-sweep LiDAR BEV + target + velocity -> waypoints
- 'cilrs':      camera + velocity + navigational command -> direct control

Same tick protocol as the MMFN agents (route planner target rotation, lidar
double-buffering for transfuser); one jitted program per agent.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.control.pid import WaypointController
from mmfn_tpu.control.planner import RoutePlanner
from mmfn_tpu.harness.agents.base import AutonomousAgent, Track, VehicleControl
from mmfn_tpu.data.batch import Batch
from mmfn_tpu.ops.image import scale_and_crop_image
from mmfn_tpu.ops.lidar import lidar_to_histogram_features, pad_points


class BaselineAgent(AutonomousAgent):
    """Config keys: 'kind' (aim|cilrs|transfuser), 'model', 'variables',
    optional 'config', 'points_per_sweep'."""

    def setup(self, conf) -> None:
        conf = conf or {}
        self.track = Track.SENSORS
        self.kind = conf.get("kind", "aim")
        self.config: GlobalConfig = conf.get("config") or GlobalConfig()
        self.model = conf["model"]
        from mmfn_tpu.harness.agents.pipeline import _pin_variables

        # device-resident once: checkpoint loads are numpy trees, and numpy
        # params re-upload on every jitted call (see JitPipeline)
        self.variables = _pin_variables(conf["variables"])
        self.points_per_sweep = conf.get("points_per_sweep", 32768)
        self.controller = WaypointController(self.config)
        self.step = -1
        self.initialized = False
        self.prev_lidar: Optional[np.ndarray] = None

        model = self.model
        kind = self.kind

        @jax.jit
        def forward(variables, image, points, target_point, velocity, command):
            bev = lidar_to_histogram_features(points) if kind == "transfuser" \
                else jnp.zeros((256, 256, 2))
            batch = Batch(image=image[None], lidar_bev=bev[None],
                          target_point=target_point[None], velocity=velocity[None])
            if kind == "cilrs":
                return model.apply(variables, batch, command[None], False)
            return model.apply(variables, batch, False)

        self._forward = forward

    def sensors(self):
        sensors = [
            {"type": "sensor.camera.rgb", "x": 1.3, "y": 0.0, "z": 2.3,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
             "width": 400, "height": 300, "fov": 100, "id": "rgb"},
            {"type": "sensor.other.imu", "x": 0.0, "y": 0.0, "z": 0.0,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0, "sensor_tick": 0.05, "id": "imu"},
            {"type": "sensor.other.gnss", "x": 0.0, "y": 0.0, "z": 0.0,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0, "sensor_tick": 0.01, "id": "gps"},
            {"type": "sensor.speedometer", "reading_frequency": 20, "id": "speed"},
        ]
        if self.kind == "transfuser":
            sensors.append({"type": "sensor.lidar.ray_cast", "x": 1.3, "y": 0.0,
                            "z": 2.5, "roll": 0.0, "pitch": 0.0, "yaw": -90.0,
                            "id": "lidar"})
        return sensors

    def _init_route(self) -> None:
        self._route_planner = RoutePlanner(4.0, 50.0)
        self._route_planner.set_route(self._global_plan, gps=True)
        self.initialized = True

    def run_step(self, input_data, timestamp) -> VehicleControl:
        control = VehicleControl()
        if not self.initialized:
            self._init_route()
        self.step += 1

        rp = self._route_planner
        pos = (np.asarray(input_data["gps"][1][:2]) - rp.mean) * rp.scale
        compass = input_data["imu"][1][-1]
        if math.isnan(compass):
            compass = 0.0
        speed = float(input_data["speed"][1]["speed"])
        next_wp, next_cmd = rp.run_step(pos)
        theta = compass + np.pi / 2
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
        target = (rot.T @ np.array([next_wp[0] - pos[0], next_wp[1] - pos[1]])).astype(np.float32)

        if self.kind == "transfuser":
            cur = input_data["lidar"][1]
            if self.step == 0:
                self.prev_lidar = cur
                return control
            points = np.concatenate([cur, self.prev_lidar], axis=0)[:, :3].copy()
            points[:, 1] *= -1
            self.prev_lidar = cur
            points4 = pad_points(points, 2 * self.points_per_sweep)
        else:
            points4 = np.zeros((1024, 4), np.float32)

        image = scale_and_crop_image(
            np.ascontiguousarray(input_data["rgb"][1][:, :, :3][:, :, ::-1]),
            scale=self.config.scale, crop=self.config.input_resolution
        ).astype(np.float32)

        command = int(getattr(next_cmd, "value", next_cmd) or 4)
        out = self._forward(self.variables, jnp.asarray(image), jnp.asarray(points4),
                            jnp.asarray(target), jnp.asarray(np.float32(speed)),
                            jnp.asarray(np.int32(command)))

        if self.kind == "cilrs":
            steer, throttle, brake, _ = out
            return VehicleControl(steer=float(steer[0]), throttle=float(throttle[0]),
                                  brake=float(brake[0] > 0.5))
        waypoints = np.asarray(out[0])
        steer, throttle, brake, _ = self.controller.control_pid(waypoints, speed)
        if float(brake) < 0.05:
            brake = 0.0
        if throttle > brake:
            brake = 0.0
        return VehicleControl(steer=float(steer), throttle=float(throttle),
                              brake=float(brake))
