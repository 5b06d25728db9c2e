"""Out-of-process agent bridge (RemoteAgent — ros_agent.py analog):
wire framing, the publish/subscribe tick contract, stepping mode, stack
liveness, and a full closed-loop drive with the stack in a subprocess."""

import os
import socket
import sys
import threading
import time

import numpy as np
import pytest

from mmfn_tpu.harness.agents.remote import (
    NavStack, RemoteAgent, recv_msg, send_msg, serve_stack)
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from tests.test_harness import STRAIGHT_XODR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_wire_roundtrip():
    a, b = socket.socketpair()
    arrays = {"img": np.arange(24, dtype=np.uint8).reshape(2, 3, 4),
              "pts": np.random.default_rng(0).normal(size=(5, 3))}
    send_msg(a, {"type": "tick", "t": 1.5,
                 "inline": {"speed": {"speed": np.float32(3.25)}}}, arrays)
    header, got = recv_msg(b)
    assert header["type"] == "tick" and header["t"] == 1.5
    assert header["inline"]["speed"]["speed"] == 3.25
    np.testing.assert_array_equal(got["img"], arrays["img"])
    np.testing.assert_array_equal(got["pts"], arrays["pts"])
    a.close(), b.close()


def _thread_stack(agent_conf, stack):
    """Run serve_stack(stack) in a thread dialing the agent's socket."""
    t = threading.Thread(
        target=serve_stack, args=(stack,),
        kwargs={"socket_path": agent_conf["socket"]}, daemon=True)
    t.start()
    return t


def _fresh_socket(tmp_path):
    return {"socket": str(tmp_path / "bridge.sock")}


class _EchoStack:
    """Returns steer = sum of the gps array (proves payload round-trip)."""

    def __init__(self):
        self.hello = None
        self.plan = None

    def on_hello(self, header):
        self.hello = header

    def on_plan(self, header):
        self.plan = header

    def __call__(self, header, arrays):
        return {"steer": float(arrays["gps"].sum()),
                "throttle": header["t"]}


def _feed(agent, tick, gps, frame=0):
    if "gps" not in agent.sensor_interface._sensors:
        for spec in agent.sensors():
            agent.sensor_interface.register_sensor(spec["id"])
    agent.sensor_interface.update_sensor("gps", np.asarray(gps), frame)
    agent.sensor_interface.update_sensor("imu", np.zeros(7), frame)
    agent.sensor_interface.update_sensor("speed", {"speed": 1.0}, frame)
    return agent(tick)


def test_tick_control_and_latched_messages(tmp_path):
    conf = _fresh_socket(tmp_path)
    stack = _EchoStack()
    _thread_stack(conf, stack)   # dials (with retry) while setup() accepts
    agent = RemoteAgent(dict(conf, stepping=True))
    try:
        agent.set_global_plan(
            [({"lat": 0.0, "lon": 0.0, "z": 0.0}, 4),
             ({"lat": 1.0, "lon": 0.0, "z": 0.0}, 4)],
            [((0.0, 0.0), 4), ((111000.0, 0.0), 4)])
        # first tick: step_mode not yet possible -> doesn't block
        c0 = _feed(agent, 0.05, [0.25, 0.5, 0.0])
        assert c0.brake == 0.0
        # once the first control lands, stepping blocks until a fresh one
        deadline = time.time() + 5
        while not agent.step_mode_possible and time.time() < deadline:
            time.sleep(0.01)
        assert agent.step_mode_possible
        c1 = _feed(agent, 0.10, [0.25, 0.5, 0.0], frame=1)
        assert c1.steer == pytest.approx(0.75)
        assert c1.throttle == pytest.approx(0.10)
        assert stack.hello["sensors"][0]["type"] == "sensor.other.gnss"
        assert stack.plan["world"][1][:2] == [111000.0, 0.0]  # latched plan
        assert len(stack.plan["gps"]) == 2
    finally:
        agent.destroy()
    assert not os.path.exists(conf["socket"])


def test_dead_stack_raises(tmp_path):
    conf = _fresh_socket(tmp_path)
    # a stack that connects then exits immediately
    agent = RemoteAgent(dict(conf, stack_cmd=(
        sys.executable + " -c \"import socket,os;"
        "s=socket.socket(socket.AF_UNIX);"
        "s.connect(os.environ['MMFN_BRIDGE_SOCKET'])\"")))
    try:
        deadline = time.time() + 10
        while agent.stack_process.poll() is None and time.time() < deadline:
            time.sleep(0.05)
        with pytest.raises(RuntimeError, match="Stack exited"):
            _feed(agent, 0.05, [0.0, 0.0, 0.0])
    finally:
        agent.destroy()


def test_step_timeout_raises(tmp_path):
    conf = _fresh_socket(tmp_path)

    class _OneShot:
        """Answers the first tick (arming step mode), then goes silent."""

        def __init__(self):
            self.n = 0

        def __call__(self, header, arrays):
            self.n += 1
            if self.n == 1:
                return {"throttle": 0.5}
            time.sleep(30)   # never answers within the step timeout
            return {}

    _thread_stack(conf, _OneShot())
    agent = RemoteAgent(dict(conf, stepping=True, step_timeout=0.3))
    try:
        _feed(agent, 0.05, [0.0, 0.0, 0.0])                 # arms step mode
        deadline = time.time() + 5
        while not agent.step_mode_possible and time.time() < deadline:
            time.sleep(0.01)
        assert agent.step_mode_possible
        # no manual _control_event.clear() needed: the seq echo means the
        # straggler ack for tick 0 cannot satisfy tick 1's stepping wait
        with pytest.raises(RuntimeError, match="no control"):
            _feed(agent, 0.10, [0.0, 0.0, 0.0], frame=1)
    finally:
        agent.destroy()


def test_stale_ack_does_not_unblock_next_tick(tmp_path):
    """A late in-flight control for tick N-1 must not unblock tick N: the
    stepping wait matches the echoed seq, not just 'any control arrived'."""
    conf = _fresh_socket(tmp_path)

    class _Laggard:
        """Answers tick 0 instantly, answers tick 1 only after a delay —
        simulating the ack for tick 0 landing while tick 1 is waiting."""

        def __call__(self, header, arrays):
            if header["seq"] >= 1:
                time.sleep(0.4)
                return {"steer": 0.9}
            return {"steer": 0.1}

    _thread_stack(conf, _Laggard())
    agent = RemoteAgent(dict(conf, stepping=True, step_timeout=5.0))
    try:
        _feed(agent, 0.05, [0.0, 0.0, 0.0])
        deadline = time.time() + 5
        while not agent.step_mode_possible and time.time() < deadline:
            time.sleep(0.01)
        # inject a stale ack for seq 0 right before tick 1 blocks: the event
        # fires but the wait must reject it and keep waiting for seq >= 1
        agent._control_seq = 0
        agent._control_event.set()
        c1 = _feed(agent, 0.10, [0.0, 0.0, 0.0], frame=1)
        assert c1.steer == pytest.approx(0.9)
    finally:
        agent.destroy()


def test_hung_stack_send_timeout(tmp_path):
    """A stack that stops READING (hung, not exited) must not hang run_step
    forever: the SO_SNDTIMEO kernel send timeout converts the filled socket
    buffer into a RuntimeError."""
    conf = _fresh_socket(tmp_path)

    def _dial_and_sleep():
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        deadline = time.time() + 10
        while True:
            try:
                s.connect(conf["socket"])
                break
            except (FileNotFoundError, ConnectionRefusedError):
                if time.time() > deadline:
                    raise
                time.sleep(0.02)
        time.sleep(60)   # never reads a byte

    threading.Thread(target=_dial_and_sleep, daemon=True).start()
    agent = RemoteAgent(dict(conf, send_timeout=0.5))
    try:
        big = np.zeros((512, 512, 3), np.uint8)   # ~786 KB/tick
        agent.sensor_interface.register_sensor("cam")
        with pytest.raises(RuntimeError, match="stopped reading"):
            for frame in range(64):   # buffer fills within a few ticks
                agent.sensor_interface.update_sensor("cam", big, frame)
                agent(0.05 * frame)
    finally:
        agent.destroy()


def test_closed_loop_with_subprocess_stack(tmp_path):
    """Full drive: RemoteAgent launches examples/remote_stack.py as a real
    subprocess (the start.sh contract) and the NavStack completes a straight
    route in the fake world."""
    from tests.conftest import clean_subprocess_env

    stack_cmd = "%s %s" % (sys.executable,
                           os.path.join(REPO, "examples", "remote_stack.py"))
    agent = RemoteAgent({"socket": str(tmp_path / "bridge.sock"),
                         "stack_cmd": stack_cmd, "stepping": True,
                         "step_timeout": 60.0,   # generous under CI load
                         "env": clean_subprocess_env()})
    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (100.0, 1.75, 0.0)],
                         index=0)
    try:
        record = ClosedLoopRunner(max_wall_seconds=120).run_route(
            agent, config, STRAIGHT_XODR)
    finally:
        agent.destroy()
    assert record.scores["score_route"] > 95.0


def test_navstack_brakes_without_plan():
    assert NavStack()({"inline": {}}, {})["brake"] == 1.0
