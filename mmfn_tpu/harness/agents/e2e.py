"""Closed-loop end-to-end MMFN agents (TPU inference path).

One class covers the reference's three e2e agents:
- variant 'vec' = VectornetAgent (team_code/e2e_agent/mmfn_vectornet.py:26-314)
- variant 'rad' = RadarVecAgent  (mmfn_radar.py) — adds the fitted radar set
- variant 'img' = MMFNAgent      (mmfn_imgnet.py) — map raster stream instead
  of the vectormap (the raster must be supplied via input_data['map_raster'])

Tick protocol (parity with the reference):
- first frame: write the opendrive string to <tmp>/opendrive/opstr.txt, run
  the native rough_map_node, load the .rmap (mmfn_vectornet.py:117-129)
- frames 0/1: warm up the two-sweep lidar buffer, return null control
  (mmfn_vectornet.py:208-236)
- per tick: current+previous lidar sweeps merged (y-flip only — the reference
  registers both sweeps with the current pose, so no motion correction),
  radar front(tag 1)/rear(tag 0) stacked then TTC-fitted to 81 rows, lanes
  cropped around the GPS pose, target point rotated into the ego frame,
  jitted forward, PID control with the brake<0.05 zeroing.

Deviation (opt-in, config key ``async_dispatch``): pipelined inference. The
reference blocks on the GPU forward every tick (mmfn_vectornet.py:295-309);
on a remote-attached TPU the host<->device round trip alone can eat the
50 ms tick budget. With ``async_dispatch: True`` the agent enqueues this
tick's forward without blocking and steers from the PREVIOUS tick's
waypoints (fetched by a background thread during the intervening world
tick), i.e. one sim tick (50 ms) of actuation latency — the standard
perception->control pipelining trade in real AV stacks. Off by default;
parity mode stays synchronous. See docs/PARITY.md.
"""

from __future__ import annotations

import math
import os
import tempfile
from typing import Optional

import numpy as np

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.control.pid import WaypointController
from mmfn_tpu.control.planner import RoutePlanner
from mmfn_tpu.harness.agents.base import AutonomousAgent, Track, VehicleControl
from mmfn_tpu.harness.agents.pipeline import JitPipeline
from mmfn_tpu.mapping import RoughMap, build_rmap
from mmfn_tpu.ops.image import scale_and_crop_image
from mmfn_tpu.ops.radar import radar_to_size_np


def _bgr_to_rgb(img: np.ndarray) -> np.ndarray:
    """BGRA/BGR frame -> contiguous RGB, bit-identical to the numpy
    ``[:, :, :3][:, :, ::-1]`` gather but ~12x faster (SIMD cvtColor);
    run AFTER cropping so only the kept pixels are converted."""
    import cv2

    img = np.ascontiguousarray(img)
    if img.ndim == 3 and img.shape[2] == 4:
        return cv2.cvtColor(img, cv2.COLOR_BGRA2RGB)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class MMFNAgent(AutonomousAgent):
    """Config dict keys: 'variant', 'model' (flax module), 'variables',
    optional 'config' (GlobalConfig), optional 'tmp_dir', 'rmap_tool'."""

    def setup(self, conf) -> None:
        conf = conf or {}
        self.track = Track.MAP
        self.config: GlobalConfig = conf.get("config") or GlobalConfig()
        self.variant = conf.get("variant", "vec")
        pps = conf.get("points_per_sweep", 32768)
        host_bev = conf.get("host_bev")
        if host_bev is None:
            # auto: ship whichever transport is smaller — the padded f16
            # cloud ((2*pps, 4) f16 = 16*pps bytes) or the 131 KB uint8 BEV
            # count grid (bit-identical bin math, ops/lidar.py:bev_counts_np;
            # the reference also bins on host, dataloader.py:271-293). At the
            # default 32768 points/sweep that is 524 KB -> 131 KB per tick.
            host_bev = 16 * pps > 256 * 256 * 2
        if "pipeline" in conf:
            self.pipeline = conf["pipeline"]
        elif conf.get("device_world"):
            # sensors synthesized ON DEVICE inside the forward program; the
            # world must run with compact_sensors=True (harness/device_world)
            from mmfn_tpu.harness.device_world import DeviceWorldPipeline

            self.pipeline = DeviceWorldPipeline(
                conf["model"], conf["variables"], self.config,
                mesh=conf.get("mesh"))
        else:
            self.pipeline = JitPipeline(
                conf["model"], conf["variables"], self.config,
                points_per_sweep=pps, host_bev=host_bev,
                mesh=conf.get("mesh"), packed=conf.get("packed", True))
        self.controller = WaypointController(self.config)
        self.rough_map = RoughMap(self.config.up, self.config.down, self.config.left,
                                  self.config.right, self.config.lane_node_num,
                                  self.config.feature_num)
        self.rough_map_loaded = False
        self._tmp_dir = conf.get("tmp_dir") or tempfile.mkdtemp(prefix="mmfn_tpu_map_")
        self._rmap_tool = conf.get("rmap_tool")
        self.step = -1
        self.initialized = False
        self.prev_lidar: Optional[np.ndarray] = None
        self.pid_metadata = {}
        self.async_dispatch = bool(conf.get("async_dispatch", False))
        self._fetcher = None
        self._pending = None  # (Future[np.ndarray waypoints], speed at dispatch)
        if self.async_dispatch:
            import concurrent.futures
            self._fetcher = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mmfn_wp_fetch")

    def sensors(self):
        return [
            {"type": "sensor.camera.rgb", "x": 1.3, "y": 0.0, "z": 2.3,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
             "width": 400, "height": 300, "fov": 100, "id": "rgb"},
            {"type": "sensor.lidar.ray_cast", "x": 1.3, "y": 0.0, "z": 2.5,
             "roll": 0.0, "pitch": 0.0, "yaw": -90.0, "id": "lidar"},
            {"type": "sensor.other.imu", "x": 0.0, "y": 0.0, "z": 0.0,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0, "sensor_tick": 0.05, "id": "imu"},
            {"type": "sensor.other.gnss", "x": 0.0, "y": 0.0, "z": 0.0,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0, "sensor_tick": 0.01, "id": "gps"},
            {"type": "sensor.speedometer", "reading_frequency": 20, "id": "speed"},
            {"type": "sensor.opendrive_map", "reading_frequency": 30, "id": "opendrive"},
            {"type": "sensor.other.radar", "x": 2.8, "y": 0.0, "z": 1.0,
             "roll": 0.0, "pitch": 5.0, "yaw": 0.0, "fov": 35, "id": "radar_front"},
            {"type": "sensor.other.radar", "x": -2.8, "y": 0.0, "z": 1.0,
             "roll": 0.0, "pitch": 5.0, "yaw": -180, "fov": 35, "id": "radar_rear"},
        ]

    # ---- helpers ------------------------------------------------------------ #

    def _init_route(self) -> None:
        self._route_planner = RoutePlanner(4.0, 50.0)
        self._route_planner.set_route(self._global_plan, gps=True)
        self.initialized = True

    def _save_map(self, opendrive_str: str) -> None:
        map_dir = os.path.join(self._tmp_dir, "opendrive")
        os.makedirs(map_dir, exist_ok=True)
        with open(os.path.join(map_dir, "opstr.txt"), "w") as f:
            f.write(opendrive_str)
        if build_rmap([map_dir], tool_path=self._rmap_tool):
            raise RuntimeError("rough_map_node failed; cannot build vectormap")
        self.rough_map.read(os.path.join(map_dir, "a.rmap"))
        self.rough_map_loaded = True

    def _position(self, gps_latlon: np.ndarray) -> np.ndarray:
        rp = self._route_planner
        return (gps_latlon[:2] - rp.mean) * rp.scale

    def _ego_target(self, input_data: dict):
        """Compass (NaN-guarded), GPS position, ego-frame target point from
        the route planner, and the next command — shared by the full-sensor
        (:meth:`_tick`) and compact-world (:meth:`_prepare_compact`) paths
        so the theta convention can never diverge between them."""
        compass = input_data["imu"][1][-1]
        if math.isnan(compass):
            compass = 0.0
        pos = self._position(np.asarray(input_data["gps"][1]))
        next_wp, next_cmd = self._route_planner.run_step(pos)
        theta = compass + np.pi / 2
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
        target_point = rot.T @ np.array([next_wp[0] - pos[0],
                                         next_wp[1] - pos[1]])
        return compass, pos, target_point, next_cmd

    def _tick(self, input_data: dict) -> dict:
        if self.step == -1:
            self._save_map(input_data["opendrive"][1]["opendrive"])
        self.step += 1

        rgb = input_data["rgb"][1]  # raw BGRA/BGR; converted after the crop
        radar_front = np.hstack([input_data["radar_front"][1],
                                 np.ones((input_data["radar_front"][1].shape[0], 1))])
        radar_rear = np.hstack([input_data["radar_rear"][1],
                                np.zeros((input_data["radar_rear"][1].shape[0], 1))])
        compass, pos, target_point, next_cmd = self._ego_target(input_data)
        pose2d = np.array([pos[0], pos[1], compass], dtype=np.float64)
        lanes, lane_num = self.rough_map.process_padded(pose2d, self.config.max_lanes)

        return {
            # raw frame passes through uncopied: the downstream center crop
            # discards ~40% of the pixels, so the BGR->RGB conversion + copy
            # happens on the crop (prepare_step), not the full 300x400 frame
            # (~0.7 ms per tick on this host, the fleet profile's #2 cost)
            "rgb": rgb,
            "lidar": input_data["lidar"][1],
            "speed": float(input_data["speed"][1]["speed"]),
            "radar": np.concatenate([radar_front, radar_rear], axis=0),
            "lanes": lanes,
            "lane_num": lane_num,
            "target_point": target_point.astype(np.float32),
            "next_command": getattr(next_cmd, "value", next_cmd),
            "map_raster": input_data.get("map_raster", (0, None))[1],
        }

    # ---- main step ----------------------------------------------------------- #

    def _prepare_compact(self, input_data: dict):
        """Compact-world prep: the world ships only its state
        (KinematicWorld(compact_sensors=True)); sensors are synthesized on
        device by the DeviceWorldPipeline. Host keeps the route planner and
        the ego-frame target-point math (identical to :meth:`_tick`)."""
        control = VehicleControl()
        if not self.rough_map_loaded and "opendrive" not in input_data:
            return "control", control
        if self.step == -1:
            self._save_map(input_data["opendrive"][1]["opendrive"])
            if not hasattr(self.pipeline, "set_map"):
                raise TypeError(
                    "compact world frames need a DeviceWorldPipeline "
                    "(pass device_world=True to the agent config)")
            self.pipeline.set_map(self.rough_map)
        self.step += 1
        if not self.initialized:
            self._init_route()
            return "control", control
        ws = input_data["world_state"][1]
        compass, pos, target_point, _ = self._ego_target(input_data)
        return "forward", {
            "compact": True,
            "pose": np.array([pos[0], pos[1], compass], np.float32),
            "target_point": target_point.astype(np.float32),
            "speed": float(input_data["speed"][1]["speed"]),
            "actors": ws["actors"], "actors_valid": ws["actors_valid"],
            "rain": ws["rain"], "brightness": ws["brightness"],
            "frame": ws["frame"],
            # traffic-light slab for the device birdview raster (absent on
            # old-format frames -> the pipeline substitutes zeros)
            **({"lights": ws["lights"]} if "lights" in ws else {}),
        }

    def prepare_step(self, input_data: dict):
        """Host half of a tick: sensor decode, crops, lane/radar fits.

        Returns ``("control", VehicleControl)`` on warm-up/no-op ticks, or
        ``("forward", payload)`` where ``payload`` holds the 8 pipeline
        arguments plus the tick's speed — feed it to the pipeline (batched by
        a fleet coordinator, or singly here) and hand the waypoints to
        :meth:`finish_step`. State updates (route init, sweep buffer) happen
        here, so the caller never mutates agent state."""
        if "world_state" in input_data:
            return self._prepare_compact(input_data)
        control = VehicleControl()
        if not self.rough_map_loaded and "opendrive" not in input_data:
            return "control", control

        if not self.initialized:
            self._init_route()
            tick = self._tick(input_data)
            self.prev_lidar = tick["lidar"]
            return "control", control

        tick = self._tick(input_data)
        if self.step == 1:  # second warm-up frame: only fill the sweep buffer
            self.prev_lidar = tick["lidar"]
            return "control", control

        # merge two sweeps; y-flip matches the dataset convention
        points = np.concatenate([tick["lidar"], self.prev_lidar], axis=0)[:, :3].copy()
        points[:, 1] *= -1
        self.prev_lidar = tick["lidar"]

        image = _bgr_to_rgb(scale_and_crop_image(
            tick["rgb"], scale=self.config.scale,
            crop=self.config.input_resolution))
        radar = radar_to_size_np(
            tick["radar"], (self.config.radar_points, self.config.radar_features)
        ).astype(np.float32)

        lanes = tick["lanes"] if self.variant in ("vec", "rad") else None
        lane_num = tick["lane_num"] if self.variant in ("vec", "rad") else None
        map_img = None
        if self.variant == "img":
            raster = tick.get("map_raster")
            map_img = (np.zeros((self.config.input_resolution,) * 2 + (3,), np.float32)
                       if raster is None else np.asarray(raster, np.float32))

        return "forward", {
            "image": image, "points": points, "lanes": lanes,
            "lane_num": lane_num, "radar": radar, "map_img": map_img,
            "target_point": tick["target_point"], "speed": tick["speed"],
        }

    def finish_step(self, payload: dict, waypoints: np.ndarray) -> VehicleControl:
        """Control half: PID over the waypoints, using the speed of the tick
        whose sensors produced them (== this tick synchronously; the previous
        tick under async_dispatch / fleet pipelining)."""
        steer, throttle, brake, self.pid_metadata = self.controller.control_pid(
            waypoints, payload["speed"])
        if float(brake) < 0.05:
            brake = 0.0
        if throttle > brake:
            brake = 0.0
        return VehicleControl(steer=float(steer), throttle=float(throttle),
                              brake=float(brake))

    def run_step(self, input_data: dict, timestamp: float) -> VehicleControl:
        kind, payload = self.prepare_step(input_data)
        if kind == "control":
            return payload

        if payload.get("compact"):
            args = (payload,)           # DeviceWorldPipeline takes the dict
        else:
            args = (payload["image"], payload["points"], payload["lanes"],
                    payload["lane_num"], payload["radar"], payload["map_img"],
                    payload["target_point"], payload["speed"])
        if self.async_dispatch:
            wp_device = self.pipeline.dispatch(*args)
            pending, self._pending = self._pending, (
                self._fetcher.submit(np.asarray, wp_device), payload)
            if pending is None:  # one extra warm-up tick: nothing to steer from yet
                return VehicleControl()
            wp_future, prev_payload = pending
            return self.finish_step(prev_payload, wp_future.result())
        return self.finish_step(payload, self.pipeline(*args))

    def destroy(self) -> None:
        if self._fetcher is not None:
            self._fetcher.shutdown(wait=False, cancel_futures=True)
            self._fetcher = None
        self._pending = None
        self.pipeline = None


def get_entry_point():
    return "MMFNAgent"
