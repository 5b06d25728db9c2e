"""Out-of-process agent bridge (leaderboard/autoagents/ros_agent.py:40-451 analog).

The reference ships a RosAgent that runs the actual driving stack in a
separate process tree: ``setup`` launches ``$TEAM_CODE_ROOT/start.sh``,
sensor frames are *published* each tick (latched ROS topics + a /clock
publisher), vehicle controls arrive *asynchronously* on a subscriber, and an
optional stepping mode blocks the tick until a fresh control for the new
frame has been received (ros_agent.py:409-450). ROS itself is transport
glue; the semantics worth rebuilding are the process contract.

This module provides the same contract over a dependency-free transport —
length-prefixed JSON headers + raw ndarray payloads on a Unix socket —
so any external stack (a ROS bridge shim included) can drive the ego:

- ``RemoteAgent.setup`` launches ``stack_cmd`` in its own process group with
  ``MMFN_BRIDGE_SOCKET`` pointing at a listening Unix socket
  (ros_agent.py:80-96's start.sh + setpgrp), then waits for the stack to dial.
- every ``run_step`` sends one ``tick`` message carrying the timestamp (the
  /clock publish, ros_agent.py:412-415) and all sensor frames; the global
  plan is sent once, latched, the first time it exists (ros_agent.py:421-425).
- a reader thread applies incoming ``control`` messages to
  ``current_control`` (the vehicle_control_cmd subscriber + event,
  ros_agent.py:113-146); with ``stepping: true`` run_step blocks until a
  control acknowledging the current tick arrives (use_stepping_mode,
  ros_agent.py:445-448): every tick carries a monotonically increasing
  ``seq`` which ``serve_stack`` echoes back in the control, so a late
  in-flight control for tick N-1 cannot unblock tick N. Stacks that do not
  echo ``seq`` fall back to any-fresh-control semantics (the reference's
  race).
- a dead stack raises RuntimeError with its exit code (ros_agent.py:417-419);
  ``destroy`` SIGTERMs the stack's process group and waits
  (ros_agent.py:166-180).

The stack side is ``serve_stack`` + any callable ``(msg, arrays, state) ->
control dict`` — see ``NavStack`` (a gps/imu P-follower, the smallest useful
external stack) and ``examples/remote_stack.py`` for the subprocess entry.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import struct
import subprocess
import tempfile
import threading
import time
from typing import Dict, Optional, Tuple

import numpy as np

from mmfn_tpu.harness.agents.base import AutonomousAgent, Track, VehicleControl

# ---------------------------------------------------------------------------
# wire format: uint32(be) header length, JSON header, then the raw bytes of
# each ndarray listed (in order) in header["arrays"] = [[name, dtype, shape]].
# ---------------------------------------------------------------------------


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("bridge peer closed")
        buf.extend(chunk)
    return bytes(buf)


def _jsonable(value):
    """Best-effort plain-Python view of scalars/dicts riding in the header."""
    if isinstance(value, dict):
        return {k: _jsonable(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, (np.integer,)):
        return int(value)
    if isinstance(value, (np.floating,)):
        return float(value)
    if isinstance(value, np.ndarray):  # small stray arrays inline as lists
        return value.tolist()
    return value


def send_msg(sock: socket.socket, header: dict,
             arrays: Optional[Dict[str, np.ndarray]] = None) -> None:
    arrays = arrays or {}
    manifest = []
    blobs = []
    for name, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        manifest.append([name, arr.dtype.str, list(arr.shape)])
        blobs.append(arr.tobytes())
    header = dict(header)
    header["arrays"] = manifest
    raw = json.dumps(header, default=_jsonable).encode()
    sock.sendall(struct.pack(">I", len(raw)) + raw + b"".join(blobs))


def recv_msg(sock: socket.socket) -> Tuple[dict, Dict[str, np.ndarray]]:
    (hlen,) = struct.unpack(">I", _recv_exact(sock, 4))
    header = json.loads(_recv_exact(sock, hlen))
    arrays = {}
    for name, dtype, shape in header.pop("arrays", []):
        nbytes = int(np.dtype(dtype).itemsize * int(np.prod(shape or [1])))
        arrays[name] = np.frombuffer(
            _recv_exact(sock, nbytes), dtype=dtype).reshape(shape)
    return header, arrays


# ---------------------------------------------------------------------------
# agent side
# ---------------------------------------------------------------------------

def default_stack_env() -> dict:
    """Environment for the stack subprocess: everything inherited EXCEPT
    single-client accelerator-relay registrations — the stack is its own
    process and must not fight the agent for the chip (dialing a busy relay
    blocks forever). The stack computes on CPU unless conf["env"] says
    otherwise."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    return env


# gps/imu/speed — the navigation-stack suite (NpcAgent's, enough for a
# route-following stack; conf["sensors"] overrides for camera/lidar stacks).
DEFAULT_SENSORS = [
    {"type": "sensor.other.gnss", "x": 0.0, "y": 0.0, "z": 0.0, "id": "gps"},
    {"type": "sensor.other.imu", "x": 0.0, "y": 0.0, "z": 0.0, "id": "imu"},
    {"type": "sensor.speedometer", "reading_frequency": 20, "id": "speed"},
]


class RemoteAgent(AutonomousAgent):
    """Bridge the ego to an external driving stack process (RosAgent analog)."""

    def setup(self, conf) -> None:
        self.track = Track.SENSORS
        conf = dict(conf or {})
        # like ros_agent.py:73-78's $TEAM_CODE_ROOT/start.sh; None means an
        # already-running stack will dial the socket itself (test mode).
        stack_cmd = conf.get("stack_cmd") or os.environ.get("MMFN_STACK_CMD")
        self._sensor_spec = conf.get("sensors") or DEFAULT_SENSORS
        self._stepping = bool(conf.get("stepping", False))
        self._step_timeout = float(conf.get("step_timeout", 10.0))
        self._sock_path = conf.get("socket") or os.path.join(
            tempfile.mkdtemp(prefix="mmfn_bridge_"), "agent.sock")
        if conf.get("socket"):
            # a user-configured path can survive a crashed run (destroy()
            # unlinks only on clean teardown) — bind would raise EADDRINUSE
            try:
                os.unlink(self._sock_path)
            except FileNotFoundError:
                pass

        self._listener = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._listener.bind(self._sock_path)
        self._listener.listen(1)
        self._listener.settimeout(float(conf.get("connect_timeout", 30.0)))

        self.stack_process = None
        if stack_cmd:
            # conf["env"] replaces the default scrubbed environment entirely
            # (pass dict(os.environ) to hand the stack the accelerator too)
            env = dict(conf.get("env") or default_stack_env(),
                       MMFN_BRIDGE_SOCKET=self._sock_path)
            # own process group so destroy() can SIGTERM the whole stack tree
            self.stack_process = subprocess.Popen(
                stack_cmd, shell=True, env=env, preexec_fn=os.setpgrp)
        try:
            self._conn, _ = self._listener.accept()
        except socket.timeout:
            self.destroy()
            raise RuntimeError("stack never connected to %s" % self._sock_path)
        self._conn.settimeout(None)
        # Kernel-level SEND timeout only (SO_SNDTIMEO, not settimeout — that
        # would also time out the reader thread's recv): a stack that stops
        # READING (hung, not exited) fills the socket buffer and would block
        # sendall forever, hanging the whole evaluation between watchdog
        # polls. On expiry sendall raises EAGAIN and run_step reports it.
        self._send_timeout = float(conf.get(
            "send_timeout", max(2.0 * self._step_timeout, 10.0)))
        sec = int(self._send_timeout)
        usec = int((self._send_timeout - sec) * 1e6)
        self._conn.setsockopt(socket.SOL_SOCKET, socket.SO_SNDTIMEO,
                              struct.pack("ll", sec, usec))
        self._send_lock = threading.Lock()

        self.current_control = VehicleControl()
        self._control_event = threading.Event()
        self._control_seq = None   # last seq the stack acknowledged
        self._tick_seq = -1
        self.step_mode_possible = False   # set after the first control arrives
        self._plan_published = False
        self._reader_alive = True
        self._reader = threading.Thread(target=self._read_controls, daemon=True)
        self._reader.start()

        try:
            send_msg(self._conn, {"type": "hello", "sensors": self._sensor_spec})
        except OSError:
            pass   # stack died right after dialing; run_step reports it

    def sensors(self):
        return self._sensor_spec

    # -- subscriber thread (on_vehicle_control, ros_agent.py:185-201) -------- #

    def _read_controls(self) -> None:
        try:
            while self._reader_alive:
                header, _ = recv_msg(self._conn)
                if header.get("type") != "control":
                    continue
                self.current_control = VehicleControl(
                    steer=float(header.get("steer", 0.0)),
                    throttle=float(header.get("throttle", 0.0)),
                    brake=float(header.get("brake", 0.0)),
                    hand_brake=bool(header.get("hand_brake", False)),
                    reverse=bool(header.get("reverse", False)))
                seq = header.get("seq")
                self._control_seq = None if seq is None else int(seq)
                self.step_mode_possible = True
                self._control_event.set()
        except (ConnectionError, OSError, ValueError):
            pass   # socket closed — run_step's liveness check reports it

    # -- tick ----------------------------------------------------------------- #

    def _publish_plan(self) -> None:
        """Latched global-plan message (publish_plan, ros_agent.py:225-247)."""
        world = [[float(p[0]), float(p[1]), int(opt)]
                 for p, opt in self._global_plan_world_coord]
        gps = [[float(g["lat"]), float(g["lon"]), int(opt)]
               for g, opt in self._global_plan]
        with self._send_lock:
            send_msg(self._conn, {"type": "plan", "world": world, "gps": gps})

    def run_step(self, input_data, timestamp) -> VehicleControl:
        if self.stack_process is not None and self.stack_process.poll() is not None:
            raise RuntimeError("Stack exited with: %s"
                               % self.stack_process.returncode)
        if self._global_plan and not self._plan_published:
            self._plan_published = True
            self._publish_plan()

        self._control_event.clear()
        arrays, inline, frames = {}, {}, {}
        for key, (frame, value) in input_data.items():
            frames[key] = int(frame)
            if isinstance(value, np.ndarray):
                arrays[key] = value
            else:
                inline[key] = _jsonable(value)
        self._tick_seq += 1
        try:
            with self._send_lock:
                send_msg(self._conn,
                         {"type": "tick", "t": float(timestamp),
                          "seq": self._tick_seq,
                          "frames": frames, "inline": inline}, arrays)
        except (socket.timeout, BlockingIOError, InterruptedError):
            raise RuntimeError(
                "stack stopped reading ticks (send blocked > %.1fs)"
                % self._send_timeout)

        if self._stepping and self.step_mode_possible and input_data:
            # wait for a control ACKNOWLEDGING this tick (seq echo); stacks
            # that don't echo seq unblock on any fresh control
            deadline = time.time() + self._step_timeout
            while True:
                remaining = deadline - time.time()
                if remaining <= 0 or not self._control_event.wait(remaining):
                    raise RuntimeError(
                        "stack produced no control within %.1fs"
                        % self._step_timeout)
                if (self._control_seq is None
                        or self._control_seq >= self._tick_seq):
                    break
                self._control_event.clear()   # stale ack for an older tick
                # re-check after the clear: the reader may have published the
                # CURRENT tick's ack between the seq read above and the
                # clear — the clear would eat its set() and the next wait
                # would block the full timeout on a control that already
                # arrived (lost-wakeup race).
                if (self._control_seq is not None
                        and self._control_seq >= self._tick_seq):
                    break
        return self.current_control

    def destroy(self) -> None:
        self._reader_alive = False
        if self.stack_process is not None and self.stack_process.poll() is None:
            try:
                os.killpg(os.getpgid(self.stack_process.pid), signal.SIGTERM)
            except (ProcessLookupError, PermissionError):
                pass
            try:
                self.stack_process.wait(timeout=10)
            except subprocess.TimeoutExpired:
                try:   # the group may exit between the wait expiry and here
                    os.killpg(os.getpgid(self.stack_process.pid),
                              signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                self.stack_process.wait()
        self.stack_process = None
        for attr in ("_conn", "_listener"):
            sock = getattr(self, attr, None)
            if sock is not None:
                try:
                    sock.close()
                except OSError:
                    pass
        if os.path.exists(getattr(self, "_sock_path", "")):
            try:
                os.unlink(self._sock_path)
            except OSError:
                pass


# ---------------------------------------------------------------------------
# stack side
# ---------------------------------------------------------------------------


def serve_stack(control_fn, socket_path: Optional[str] = None,
                dial_timeout: float = 30.0) -> None:
    """Run an external stack's receive loop: dial the agent's socket, then for
    every ``tick`` call ``control_fn(header, arrays)`` and send its dict back
    as the control. ``hello``/``plan`` messages are handed to the callable's
    optional ``on_hello``/``on_plan`` attributes. Returns when the agent
    closes the bridge."""
    socket_path = socket_path or os.environ["MMFN_BRIDGE_SOCKET"]
    sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    deadline = time.time() + dial_timeout
    while True:   # the agent may still be between bind and accept
        try:
            sock.connect(socket_path)
            break
        except (FileNotFoundError, ConnectionRefusedError):
            if time.time() > deadline:
                raise
            time.sleep(0.05)
    try:
        while True:
            try:
                header, arrays = recv_msg(sock)
            except (ConnectionError, OSError):
                return
            kind = header.get("type")
            if kind == "hello" and hasattr(control_fn, "on_hello"):
                control_fn.on_hello(header)
            elif kind == "plan" and hasattr(control_fn, "on_plan"):
                control_fn.on_plan(header)
            elif kind == "tick":
                control = control_fn(header, arrays) or {}
                # echo the tick seq so stepping mode can match ack to tick
                send_msg(sock, dict(control, type="control",
                                    seq=header.get("seq")))
    finally:
        sock.close()


class NavStack:
    """Minimal external stack: P-steer toward the next plan waypoint at a
    fixed cruise speed (what the reference's start.sh stack would do with the
    published /carla/ego_vehicle/waypoints + odometry)."""

    CRUISE_SPEED = 7.0

    def __init__(self):
        self._planner = None
        self._plan_msg = None

    def on_plan(self, header: dict) -> None:
        self._plan_msg = header

    def __call__(self, header: dict, arrays: Dict[str, np.ndarray]) -> dict:
        import math

        from mmfn_tpu.control.planner import GPS_SCALE, RoutePlanner

        if self._planner is None:
            if self._plan_msg is None:
                return {"brake": 1.0}   # no route yet
            self._planner = RoutePlanner(4.0, 50.0)
            self._planner.set_route(
                [({"lat": lat, "lon": lon}, opt)
                 for lat, lon, opt in self._plan_msg["gps"]], gps=True)
        gps = arrays["gps"]
        pos = np.array([gps[0], gps[1]]) * GPS_SCALE
        yaw = float(arrays["imu"][-1])
        speed = float(header["inline"]["speed"]["speed"])
        target, _ = self._planner.run_step(pos)
        desired = math.atan2(target[1] - pos[1], target[0] - pos[0])
        err = (desired - yaw + math.pi) % (2 * math.pi) - math.pi
        return {"steer": float(np.clip(err, -1.0, 1.0)),
                "throttle": 0.7 if speed < self.CRUISE_SPEED else 0.0}
