"""Closed-loop soak benchmark: full agent ticks/sec in the fake world.

bench.py measures the on-device pipeline; this measures what the reference's
50 ms/tick budget is actually spent on — the COMPLETE per-tick agent path
(sensor mux, PIL-style image crop, SAT lane crop around the live pose, radar
TTC fit, jitted forward with the device round-trip, PID, control) plus world
integration and criteria scoring, exactly as phase0 runs it
(VERDICT round-1, Weak #3: "host-bound" must be measured, not asserted).

Prints ONE JSON line:
  ticks/s over a soaked route, the mean agent-call latency (host+device) vs
  harness overhead split, and vs_baseline = ticks/s / 20 Hz (the CARLA
  synchronous rate the reference must keep up with,
  leaderboard_evaluator.py:61,203-205).

Full flagship config (MMFN-rad, n_layer=8, 64 lanes) with random weights —
throughput does not depend on the weights.
"""

import argparse
import json
import time

import numpy as np
import jax

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.harness.agents import MMFNAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.models import build_model

XODR = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE>
  <header revMajor="1" revMinor="4" name="line"/>
  <road name="R0" length="3000.0" id="0" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="3000.0"><line/></geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
</OpenDRIVE>
"""

SOAK_TICKS = 400
WARMUP_TICKS = 24


class _TimedAgent:
    """Wraps the agent callable to split agent time from harness time."""

    def __init__(self, agent):
        self._agent = agent
        self.agent_seconds = 0.0
        self.calls = 0

    def __getattr__(self, name):
        return getattr(self._agent, name)

    def __call__(self, timestamp):
        t0 = time.perf_counter()
        out = self._agent(timestamp)
        self.agent_seconds += time.perf_counter() - t0
        self.calls += 1
        return out


def _build_agent():
    cfg = GlobalConfig()
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)
    return MMFNAgent({"variant": "rad", "model": model, "variables": variables,
                      "config": cfg})


def _soak_mode(pipeline, config, async_dispatch: bool):
    agent = MMFNAgent({"variant": "rad", "pipeline": pipeline, "config": config,
                       "async_dispatch": async_dispatch})
    try:
        wall, timed, record = _soak(agent, SOAK_TICKS)
    finally:
        agent.destroy()              # releases the async-dispatch fetcher
    return {
        "ticks_per_sec": round(timed.calls / wall, 2),
        "agent_ms_per_tick": round(timed.agent_seconds / timed.calls * 1e3, 2),
        "harness_ms_per_tick": round(
            (wall - timed.agent_seconds) / timed.calls * 1e3, 2),
        "route_status": record.status,
    }


def _soak(agent, ticks: int):
    timed = _TimedAgent(agent)
    config = RouteConfig(route_id="0", town="TownBench",
                         trajectory=[(0.0, 1.75, 0.0), (2900.0, 1.75, 0.0)],
                         index=0)
    runner = ClosedLoopRunner(max_wall_seconds=3600)
    t0 = time.perf_counter()
    record = runner.run_route(timed, config, XODR, max_ticks=ticks)
    wall = time.perf_counter() - t0
    return wall, timed, record


def _relay_rtt_ms(n: int = 20) -> float:
    """Latency floor of a single dispatch+fetch on this host/device link.

    On a colocated TPU host this is ~0.1-0.3 ms; through this environment's
    TPU relay it is tens of ms and bounds the per-tick closed loop (the
    amortized device compute itself is <1 ms, see bench.py)."""
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    one = jnp.zeros(())
    np.asarray(f(one))
    t0 = time.perf_counter()
    for _ in range(n):
        np.asarray(f(one))
    return (time.perf_counter() - t0) / n * 1e3


def _fleet_mode(pipeline, config, n: int, ticks: int, pipelined: bool,
                compact_world: bool = False):
    """Aggregate throughput of an N-vehicle lockstep fleet (harness/fleet.py):
    N fake worlds, N full host agent paths, ONE batched device forward per
    tick (``pipelined``: steer from the previous tick's forward while this
    tick's is in flight). The serving-scale claim made from bench.py's
    batched fps (one chip ~= 128 simulated 20 Hz vehicles) measured
    end-to-end.

    ``compact_world=True`` runs the device-world mode: worlds emit compact
    state only and ``pipeline`` (a DeviceWorldPipeline) synthesizes sensors
    inside the forward — ~260 B/vehicle/tick over the link instead of
    ~340 KB (harness/device_world.py, VERDICT r3 next #2)."""
    from mmfn_tpu.harness.fleet import FleetRunner

    def run_once(run_ticks):
        agents = [MMFNAgent({"variant": "rad", "pipeline": pipeline,
                             "config": config}) for _ in range(n)]
        routes = [{"config": RouteConfig(
                       route_id=str(k), town="TownBench",
                       trajectory=[(0.0, 1.75, 0.0), (2900.0, 1.75, 0.0)],
                       index=k),
                   "opendrive_str": XODR, "max_ticks": run_ticks,
                   **({"world_kwargs": {"compact_sensors": True}}
                      if compact_world else {})}
                  for k in range(n)]
        t0 = time.perf_counter()
        try:
            records = FleetRunner(max_wall_seconds=3600,
                                  pipelined=pipelined).run(agents, routes)
        finally:
            for a in agents:
                a.destroy()
        wall = time.perf_counter() - t0
        total_ticks = sum(a.step + 1 for a in agents)  # ticks _tick() ran
        return wall, total_ticks, records

    run_once(WARMUP_TICKS)          # pays the width-N batch compile
    wall, total_ticks, records = run_once(ticks)
    agg = total_ticks / wall
    return {
        "fleet": n,
        "agg_ticks_per_sec": round(agg, 2),
        "per_vehicle_ticks_per_sec": round(agg / n, 2),
        "vehicles_at_20hz": round(agg / 20.0, 1),
        "route_status": records[0].status,
    }


def _fleet_device_side(n: int, iters: int = 50):
    """Device-side fleet ticks/s at width ``n``: the batched sensor->waypoints
    pipeline chained in a jitted ``lax.fori_loop`` (relay RTT and host prep
    amortized away — bench.py's methodology). This is what the CHIP sustains
    when the host feeds it; the host-fleet numbers above it show what this
    2-vCPU host + relay actually deliver."""
    import bench

    rng = np.random.default_rng(0)
    cfg = GlobalConfig()
    model = build_model(cfg, "rad")
    inp = bench.make_inputs(1, rng)
    from mmfn_tpu.data.batch import Batch
    from mmfn_tpu.ops.radar import radar_adjacency

    init_batch = Batch(
        image=inp["image"], lidar_bev=np.zeros((1, 256, 256, 2), np.float32),
        lanes=inp["lanes"], lane_num=inp["lane_num"], radar=inp["radar"],
        radar_adj=radar_adjacency(inp["radar"]),
        target_point=inp["target_point"], velocity=inp["velocity"])
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch, False)
    step_s = bench.timed_loop(bench.pipeline_fn(model), variables,
                              bench.make_inputs(n, rng), iters)
    ticks = n / step_s
    return {"width": n, "agg_ticks_per_sec": round(ticks, 2),
            "vehicles_at_20hz": round(ticks / 20.0, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fleet", type=int, default=0,
                    help="N>0: measure an N-vehicle lockstep fleet instead "
                         "of the single-agent soak modes")
    ap.add_argument("--fleet-sweep", type=str, default="",
                    help="comma list of fleet widths, e.g. 8,16,32,64: "
                         "host-fleet scaling curve + a device-side point")
    ap.add_argument("--ticks", type=int, default=0,
                    help="override soak ticks per route")
    ap.add_argument("--pipelined", action="store_true",
                    help="fleet mode: steer from the previous tick's batched "
                         "forward while this tick's is in flight")
    args = ap.parse_args()

    from bench import _require_device
    _require_device()

    if args.fleet_sweep:
        from mmfn_tpu.harness.device_world import DeviceWorldPipeline

        widths = [int(w) for w in args.fleet_sweep.split(",") if w]
        agent = _build_agent()
        curve = [dict(_fleet_mode(agent.pipeline, agent.config, w,
                                  args.ticks or 120, pipelined=True),
                      fleet=w) for w in widths]
        dw_pipe = DeviceWorldPipeline(agent.pipeline.model,
                                      agent.pipeline.variables, agent.config)
        dw_curve = [dict(_fleet_mode(dw_pipe, agent.config, w,
                                     args.ticks or 120, pipelined=True,
                                     compact_world=True),
                         fleet=w) for w in widths]
        device_side = _fleet_device_side(max(widths))
        best = max(c["vehicles_at_20hz"] for c in curve + dw_curve)
        print(json.dumps({
            "metric": "fleet scaling sweep (host fleet ticks/s by width + "
                      "device-world mode + device-side ceiling, full "
                      "MMFN-rad)",
            "value": best,
            "unit": "vehicles@20Hz (best width, either fleet mode)",
            "vs_baseline": best,   # reference serves exactly 1 vehicle
            "host_fleet": curve,
            "device_world_fleet": dw_curve,
            "device_side": device_side,
            "relay_rtt_ms": round(_relay_rtt_ms(), 2),
            "device": str(jax.devices()[0]),
        }))
        return

    agent = _build_agent()

    if args.fleet > 0:
        out = _fleet_mode(agent.pipeline, agent.config, args.fleet,
                          args.ticks or 120, args.pipelined)
        agg = out["agg_ticks_per_sec"]
        mode = "pipelined" if args.pipelined else "sync"
        print(json.dumps({
            "metric": f"fleet aggregate agent ticks/sec ({args.fleet} vehicles, {mode}, fake world, full MMFN-rad)",
            "value": agg,
            "unit": "ticks/s",
            "vs_baseline": round(agg / 20.0, 2),
            **out,
            "relay_rtt_ms": round(_relay_rtt_ms(), 2),
            "device": str(jax.devices()[0]),
        }))
        return
    # warmup run compiles the jit pipeline + builds the map
    _soak(agent, WARMUP_TICKS)

    # fresh agent state but shared (warm) pipeline, like phase0's route loop.
    # The default transport is packed single-buffer + auto host_bev (both
    # lossless, docs/PERFORMANCE.md) — sync IS parity mode: the same blocking
    # forward per tick as the reference, the bytes just ride in one buffer.
    sync = _soak_mode(agent.pipeline, agent.config, async_dispatch=False)
    # pipelined mode: enqueue tick N, steer from tick N-1 (one 50 ms sim tick
    # of actuation latency, docs/PARITY.md) — hides the host<->device RTT
    pipelined = _soak_mode(agent.pipeline, agent.config, async_dispatch=True)

    # round-2 transport for the A/B: eight per-array transfers, padded f16
    # cloud shipped instead of the uint8 count grid
    from mmfn_tpu.harness.agents.pipeline import JitPipeline

    legacy_pipeline = JitPipeline(agent.pipeline.model,
                                  agent.pipeline.variables, agent.config,
                                  host_bev=False, packed=False)
    legacy_warm = MMFNAgent({"variant": "rad", "pipeline": legacy_pipeline,
                             "config": agent.config})
    _soak(legacy_warm, WARMUP_TICKS)
    sync_legacy = _soak_mode(legacy_pipeline, agent.config,
                             async_dispatch=False)

    best = max(sync["ticks_per_sec"], pipelined["ticks_per_sec"])
    print(json.dumps({
        "metric": "closed-loop agent ticks/sec (fake world, full MMFN-rad)",
        "value": best,
        "unit": "ticks/s",
        "vs_baseline": round(best / 20.0, 2),
        "sync": sync,
        "pipelined": pipelined,
        "sync_per_array_transport": sync_legacy,
        "ticks": SOAK_TICKS,
        "relay_rtt_ms": round(_relay_rtt_ms(), 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
