"""Post-hoc metrics over episode recordings — the srunner metrics analog.

The reference vendors scenario_runner's metrics module: ``MetricsLog`` wraps a
CARLA recorder log with per-actor/per-frame query methods and user metrics
subclass ``BasicMetric`` (reference srunner/metrics/tools/metrics_log.py:20-416,
srunner/metrics/examples/basic_metric.py:13-43, driven by
scenario_runner/metrics_manager.py:31-120). CARLA replays the binary log
through the simulator to answer queries; here the recording
(`harness.recording`, a self-contained JSON document) is parsed once into
columnar numpy arrays per actor, so every "all frames" query is a slice — no
simulator, no per-frame RPC.

API parity: the method names and semantics below match the reference's
MetricsLog for everything the fake world represents (transforms, velocities,
angular velocity, acceleration, alive frames, role/type lookups, vehicle
controls, traffic-light state, collisions, frame times). CARLA-only surfaces
(physics control, vehicle light flags, scene lights) have no analog and are
omitted. Angular velocity and acceleration are finite-differenced from the
recorded states — the recorder stores the kinematic ground truth, not sensor
estimates.
"""

from __future__ import annotations

import importlib.util
import inspect
import math
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from mmfn_tpu.harness.recording import EpisodeRecorder


class MetricsLog:
    """Query interface over one ``mmfn_tpu-episode-v1`` recording."""

    def __init__(self, recording):
        """recording: a dict (EpisodeRecorder.data) or a path to one."""
        if isinstance(recording, str):
            recording = EpisodeRecorder.load(recording)
        self._rec = recording
        self._dt = float(recording["dt"])
        self._actors = recording["actors"]
        frames = recording["frames"]
        self._times = np.array([f["time"] for f in frames])
        self._platform = np.array([f["platform_time"] for f in frames])
        self._controls = np.array([f["control"] for f in frames]
                                  or np.zeros((0, 3)))
        self._lights = [f["lights"] for f in frames]
        # columnar per-actor state over the alive span: [x, y, yaw, vx, vy]
        self._states: Dict[str, np.ndarray] = {}
        for aid, meta in self._actors.items():
            n = meta["last_frame"] - meta["first_frame"] + 1
            arr = np.full((n, 5), np.nan)
            for i in range(n):
                s = frames[meta["first_frame"] + i]["states"].get(aid)
                if s is not None:
                    arr[i] = s
            self._states[aid] = arr
        self._collisions: Dict[str, Dict[int, int]] = {}
        for fi, f in enumerate(frames):
            for other in f["collisions"]:
                self._collisions.setdefault("0", {})[fi] = int(other)

    # -- frame/time queries (metrics_log.py:52-79) -------------------------

    def get_total_frame_count(self) -> int:
        return len(self._times)

    def get_elapsed_time(self, frame: int) -> float:
        return float(self._times[frame])

    def get_delta_time(self, frame: int) -> float:
        return self._dt

    def get_platform_time(self, frame: int) -> float:
        return float(self._platform[frame])

    # -- actor lookups (metrics_log.py:81-181) ------------------------------

    def get_ego_vehicle_id(self) -> int:
        return self.get_actor_ids_with_role_name("hero")[0]

    def get_actor_ids_with_role_name(self, role_name: str) -> List[int]:
        return [int(aid) for aid, m in self._actors.items()
                if m["role_name"] == role_name]

    def get_actor_ids_with_type_id(self, type_pattern: str) -> List[int]:
        """Prefix/wildcard match as in the reference (fnmatch semantics)."""
        import fnmatch
        return [int(aid) for aid, m in self._actors.items()
                if fnmatch.fnmatch(m["type_id"], type_pattern)]

    def get_actor_attributes(self, actor_id: int) -> Optional[dict]:
        m = self._actors.get(str(actor_id))
        return dict(m) if m else None

    def get_actor_bounding_box(self, actor_id: int) -> Optional[float]:
        """Half-extent (m) of the actor's footprint (the fake world's actors
        are discs/squares; CARLA's 3-D box reduces to this)."""
        m = self._actors.get(str(actor_id))
        return float(m["extent"]) if m else None

    def get_actor_alive_frames(self, actor_id: int) -> Tuple[int, int]:
        m = self._actors[str(actor_id)]
        return m["first_frame"], m["last_frame"]

    # -- per-frame state (metrics_log.py:184-358) ---------------------------

    def _state(self, actor_id: int, frame: int) -> Optional[np.ndarray]:
        m = self._actors.get(str(actor_id))
        if m is None or not (m["first_frame"] <= frame <= m["last_frame"]):
            return None
        row = self._states[str(actor_id)][frame - m["first_frame"]]
        return None if np.isnan(row[0]) else row

    def _all_states(self, actor_id: int, first_frame=None, last_frame=None):
        m = self._actors[str(actor_id)]
        lo = m["first_frame"] if first_frame is None else first_frame
        hi = m["last_frame"] if last_frame is None else last_frame
        lo, hi = max(lo, m["first_frame"]), min(hi, m["last_frame"])
        return self._states[str(actor_id)][lo - m["first_frame"]:
                                           hi - m["first_frame"] + 1]

    def get_actor_transform(self, actor_id: int, frame: int):
        """(x, y, yaw) or None if the actor isn't alive at ``frame``."""
        s = self._state(actor_id, frame)
        return None if s is None else (float(s[0]), float(s[1]), float(s[2]))

    def get_all_actor_transforms(self, actor_id: int, first_frame=None,
                                 last_frame=None) -> np.ndarray:
        """[n, 3] array of (x, y, yaw) over the (clamped) frame span."""
        return self._all_states(actor_id, first_frame, last_frame)[:, :3]

    def get_actor_transforms_at_frame(self, frame: int,
                                      actor_list=None) -> Dict[int, tuple]:
        ids = actor_list or [int(a) for a in self._actors]
        out = {}
        for aid in ids:
            t = self.get_actor_transform(aid, frame)
            if t is not None:
                out[aid] = t
        return out

    def get_actor_velocity(self, actor_id: int, frame: int):
        s = self._state(actor_id, frame)
        return None if s is None else (float(s[3]), float(s[4]))

    def get_all_actor_velocities(self, actor_id: int, first_frame=None,
                                 last_frame=None) -> np.ndarray:
        return self._all_states(actor_id, first_frame, last_frame)[:, 3:5]

    def get_actor_angular_velocity(self, actor_id: int, frame: int):
        """Yaw rate (rad/s), central-differenced from recorded headings."""
        a = self._state(actor_id, frame)
        if a is None:
            return None
        b = self._state(actor_id, frame - 1)
        if b is None:
            return 0.0
        dyaw = (a[2] - b[2] + math.pi) % (2 * math.pi) - math.pi
        return float(dyaw / self._dt)

    def get_actor_acceleration(self, actor_id: int, frame: int):
        """(ax, ay) m/s^2, backward-differenced from recorded velocities."""
        a = self._state(actor_id, frame)
        b = self._state(actor_id, frame - 1)
        if a is None:
            return None
        if b is None:
            return (0.0, 0.0)
        return (float((a[3] - b[3]) / self._dt),
                float((a[4] - b[4]) / self._dt))

    def get_vehicle_control(self, vehicle_id: int, frame: int):
        """(steer, throttle, brake) — recorded for the ego only (the fake
        world's other actors are kinematic, they have no control channel)."""
        if int(vehicle_id) != self.get_ego_vehicle_id():
            return None
        c = self._controls[frame]
        return (float(c[0]), float(c[1]), float(c[2]))

    # -- traffic lights (metrics_log.py:363-396) -----------------------------

    def get_traffic_light_state(self, light_index: int,
                                frame: int) -> Optional[str]:
        lights = self._lights[frame]
        return lights[light_index] if light_index < len(lights) else None

    def get_traffic_light_elapsed_time(self, light_index: int,
                                       frame: int) -> Optional[float]:
        """Seconds the light has held its state at ``frame``."""
        state = self.get_traffic_light_state(light_index, frame)
        if state is None:
            return None
        f = frame
        while f > 0 and self.get_traffic_light_state(light_index,
                                                     f - 1) == state:
            f -= 1
        return (frame - f) * self._dt

    def get_weather(self, frame: int) -> str:
        """Weather preset in effect at ``frame`` (animates under a
        WeatherSim; empty for recordings made before weather capture)."""
        return str(self._rec["frames"][frame].get("weather", ""))

    # -- collisions (metrics_log.py:34-50) -----------------------------------

    def get_actor_collisions(self, actor_id: int) -> Dict[int, int]:
        """{frame: other_actor_id} for the actor's recorded collisions."""
        return dict(self._collisions.get(str(actor_id), {}))

    # -- criteria ------------------------------------------------------------

    def get_criteria(self) -> dict:
        return dict(self._rec.get("criteria", {}))


class BasicMetric:
    """Base class of user metrics (basic_metric.py:13-43): subclasses
    implement ``_create_metric(town_map, log, criteria)``; instantiation runs
    it. ``town_map`` is the vectorized map (`mapping.RoughMap`) — the
    Waypoint-API analog — or None when the runner was asked to skip it.
    ``self.out_dir`` is where metrics should write their outputs."""

    out_dir = "."

    def __init__(self, town_map, log: MetricsLog, criteria=None):
        self._create_metric(town_map, log, criteria)

    def _create_metric(self, town_map, log, criteria):
        raise NotImplementedError("metrics must implement _create_metric")


def load_metric_class(metric_file: str):
    """First BasicMetric subclass found in the module at ``metric_file``
    (metrics_manager.py:92-113 semantics, without mutating sys.path)."""
    name = os.path.basename(metric_file).rsplit(".", 1)[0]
    spec = importlib.util.spec_from_file_location(name, metric_file)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    for _, member in inspect.getmembers(module, inspect.isclass):
        if issubclass(member, BasicMetric) and member is not BasicMetric:
            return member
    raise ValueError(f"{metric_file}: no BasicMetric subclass found")


def run_metric(metric, recording, town_map=None, criteria=None,
               out_dir: str = "."):
    """Run one metric (class or .py path) over a recording (dict or path).

    Builds the map from the recording's embedded OpenDRIVE when ``town_map``
    is None (metrics_manager.py loads the recorded map the same way).
    Returns the metric instance (metrics expose results as attributes and/or
    files under ``out_dir``).
    """
    if isinstance(metric, str):
        metric = load_metric_class(metric)
    log = MetricsLog(recording)
    if town_map is None and log._rec.get("opendrive"):
        from mmfn_tpu.mapping import vectorize_xodr
        town_map, _, _ = vectorize_xodr(log._rec["opendrive"],
                                        birdview=False)
    if criteria is None:
        criteria = log.get_criteria()
    metric.out_dir = out_dir
    return metric(town_map, log, criteria)
