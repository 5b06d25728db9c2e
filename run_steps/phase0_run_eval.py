#!/usr/bin/env python
"""phase0: closed-loop evaluation over a route set.

TPU rebuild of run_steps/phase0_run_eval.py + the leaderboard evaluator loop:
iterates routes with resume, runs each through the closed loop, registers
statistics, and writes the leaderboard-format checkpoint JSON.

Two simulator backends:
- ``simulator: fake``  — the kinematic fake world (no CARLA needed); useful
  for harness validation and latency soak tests.
- ``simulator: carla`` — drives a CARLA server through
  mmfn_tpu.harness.carla_glue (requires the carla package + a server).

Usage:
    python run_steps/phase0_run_eval.py --config run_steps/config/eval.yaml \
        [agent.variant=vec routes=path.xml ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.harness.agents import MMFNAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteIndexer
from mmfn_tpu.harness.result_writer import format_global_summary, format_route_record
from mmfn_tpu.harness.statistics import StatisticsManager
from mmfn_tpu.models import build_model
from mmfn_tpu.utils.cli import load_config
from mmfn_tpu.utils.logging import bcolors as bc
from mmfn_tpu.utils.compile_cache import enable_persistent_cache

# warm re-runs/resumes: full-model compiles dominate cold-start wall-clock
enable_persistent_cache()

FALLBACK_XODR = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE><header revMajor="1" revMinor="4" name="line"/>
<road name="R0" length="1000.0" id="0" junction="-1">
<planView><geometry s="0.0" x="-500.0" y="0.0" hdg="0.0" length="1000.0"><line/></geometry></planView>
<lanes><laneSection s="0.0"><center><lane id="0" type="none" level="false"/></center>
<right><lane id="-1" type="driving" level="false"><width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/></lane></right>
</laneSection></lanes></road></OpenDRIVE>
"""


def _route_save_path(data_save, route_index):
    """Per-route dataset dir: writing several routes into one directory
    would overwrite frames (DatasetWriter restarts ids per agent). A path
    already naming a route (…/route_NN) is used as-is — single-route runs
    and tests address the exact directory."""
    import re

    if data_save is None or route_index is None \
            or re.search(r"route_\d+$", str(data_save)):
        return data_save
    return os.path.join(str(data_save), f"route_{route_index:02d}")


def build_agent(cfg, shared=None, route_index=None):
    """Construct a fresh agent per route (leaderboard_evaluator.py:264).
    ``shared`` caches the jitted pipeline across routes to avoid recompiles."""
    shared = shared if shared is not None else {}
    agent_cfg = cfg["agent"]
    agent_type = agent_cfg.get("type", "e2e")
    if agent_type == "auto":
        # AutoPilot = the SimplePilot rule stack under the expert agent
        # (auto_pilot.py is MMFNPilot's simpler sibling in the reference)
        agent_type = "expert"
        agent_cfg = {**agent_cfg, "pilot": "auto"}
    if agent_type == "expert":
        # data-collection mode (the reference's phase0 collect with MMFNPilot)
        from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent

        return ExpertCollectionAgent({
            "config": GlobalConfig(max_lanes=agent_cfg.get("max_lanes", 64)),
            "save_path": _route_save_path(agent_cfg.get("data_save"),
                                          route_index),
            "image_ext": agent_cfg.get("image_ext", "png"),
            "seed": agent_cfg.get("seed", 0),
            "pilot": agent_cfg.get("pilot", "mmfn"),
            # reference expert.yaml:1-2 ships force_destory_actor: True
            "force_unblock": agent_cfg.get("force_unblock", True),
        })
    if agent_type == "npc":
        from mmfn_tpu.harness.agents.trivial import NpcAgent

        return NpcAgent()
    if agent_type == "remote":
        # external stack over the process bridge (RosAgent analog):
        # agent.stack_cmd="python my_stack.py" (or $MMFN_STACK_CMD)
        from mmfn_tpu.harness.agents.remote import RemoteAgent

        return RemoteAgent({k: agent_cfg[k] for k in
                            ("stack_cmd", "sensors", "stepping", "socket",
                             "step_timeout", "connect_timeout", "env",
                             "send_timeout")
                            if k in agent_cfg})
    if agent_type in ("aim", "cilrs", "transfuser"):
        from mmfn_tpu.harness.agents.baseline import BaselineAgent
        from mmfn_tpu.models import get_entry_point as get_model
        from mmfn_tpu.train import create_train_state

        gconf = GlobalConfig(max_lanes=agent_cfg.get("max_lanes", 64))
        model = get_model(agent_type)(gconf)
        batch = synthetic_batch(batch_size=1, max_lanes=gconf.max_lanes)
        # create_train_state resolves the per-variant init signature (CILRS
        # takes the command) and doubles as the checkpoint template
        state = create_train_state(model, gconf, jax.random.PRNGKey(0), batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        model_path = agent_cfg.get("model_path")
        ckpt = os.path.join(model_path or "", "best_model.msgpack")
        if model_path and os.path.exists(ckpt):
            from flax import serialization

            with open(ckpt, "rb") as f:
                state = serialization.from_bytes(state, f.read())
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            print(f"{bc.OKGREEN}loaded checkpoint {ckpt}{bc.ENDC}")
        else:
            print(f"{bc.WARNING}no checkpoint at {ckpt}; "
                  f"using random init{bc.ENDC}")
        return BaselineAgent({"kind": agent_type, "model": model,
                              "variables": variables, "config": gconf})
    # model-shape overrides so checkpoints trained at other sizes load
    # (e.g. the examples/train_fake_world.py demo: n_layer=2 max_lanes=16);
    # attn_impl=pallas selects the fused inference attention kernel
    # (ops/attention.py)
    overrides = {k: agent_cfg[k]
                 for k in ("n_layer", "n_embd", "n_head", "attn_impl")
                 if k in agent_cfg}
    gconf = GlobalConfig(max_lanes=agent_cfg.get("max_lanes", 64), **overrides)
    if "pipeline" in shared:
        # later routes (and fleet members beyond the first) reuse the warm
        # jitted pipeline — skip the model build / init / checkpoint load
        return MMFNAgent({"variant": agent_cfg.get("variant", "vec"),
                          "pipeline": shared["pipeline"], "config": gconf,
                          "async_dispatch": agent_cfg.get("async_dispatch", False)})
    model = build_model(gconf, agent_cfg.get("variant", "vec"))
    batch = synthetic_batch(batch_size=1, max_lanes=gconf.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    model_path = agent_cfg.get("model_path")
    ckpt = os.path.join(model_path or "", "best_model.msgpack")
    if model_path and os.path.exists(ckpt):
        from flax import serialization
        from mmfn_tpu.train import create_train_state

        template = create_train_state(model, gconf, jax.random.PRNGKey(0), batch)
        with open(ckpt, "rb") as f:
            state = serialization.from_bytes(template, f.read())
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"{bc.OKGREEN}loaded checkpoint {ckpt}{bc.ENDC}")
    else:
        print(f"{bc.WARNING}no checkpoint at {ckpt}; using random init{bc.ENDC}")

    conf = {"variant": agent_cfg.get("variant", "vec"),
            "model": model, "variables": variables, "config": gconf,
            # opt-in pipelined inference (one-tick actuation latency,
            # docs/PARITY.md): agent.async_dispatch=true; agent.host_bev=true
            # bins lidar on host and ships the uint8 count grid (thin links)
            "async_dispatch": agent_cfg.get("async_dispatch", False),
            "host_bev": agent_cfg.get("host_bev", False),
            # agent.device_world=true: synthesize sensors ON DEVICE inside
            # the forward program (harness/device_world.py) — pairs with
            # compact_sensors on the fake world (wired below); vec/rad only
            "device_world": bool(agent_cfg.get("device_world", False))}
    # agent.fleet_devices=N: shard the fleet's batched forward across the
    # first N local devices (collective-free data-parallel serving; pairs
    # with the top-level `fleet:` width — see harness/agents/pipeline.py)
    n_dev = int(agent_cfg.get("fleet_devices", 1))
    if n_dev > 1:
        import numpy as _np
        from jax.sharding import Mesh

        devices = jax.devices()
        if len(devices) < n_dev:
            raise SystemExit(f"agent.fleet_devices={n_dev} but only "
                             f"{len(devices)} devices are visible")
        conf["mesh"] = Mesh(_np.array(devices[:n_dev]), ("fleet",))
    if "pipeline" in shared:
        conf["pipeline"] = shared["pipeline"]
    agent = MMFNAgent(conf)
    shared["pipeline"] = agent.pipeline
    return agent


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(os.path.dirname(__file__),
                                                     "config", "eval.yaml"))
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, args.overrides)

    endpoint = cfg.get("checkpoint", "results/eval.json")
    # OpenSCENARIO episodes (.xosc) derive their route from the hero's init
    # position and run their storyboard through OpenScenarioManager below
    is_xosc = str(cfg.get("routes", "")).endswith(".xosc")
    indexer = None
    statistics = StatisticsManager()
    if not is_xosc:
        indexer = RouteIndexer(cfg["routes"],
                               repetitions=int(cfg.get("repetitions", 1)))
        if cfg.get("resume"):
            indexer.resume(endpoint)
    if cfg.get("resume"):
        statistics.resume(endpoint)

    if cfg.get("simulator", "fake") == "carla":
        if is_xosc:
            raise SystemExit("OpenSCENARIO routes are supported by the fake "
                             "world; the CARLA path runs XML routes "
                             "(srunner owns .xosc there)")
        from mmfn_tpu.harness.carla_glue import run_carla_evaluation

        run_carla_evaluation(cfg, indexer, statistics, build_agent, endpoint)
        return

    # the fake world's map: `map:` in the config names an OpenDRIVE file
    # (e.g. data/maps/fake_town_loop.xodr); default is a straight road.
    # Vectorize it once so the outside-lanes penalty applies and the
    # deterministic birdview camera (the fake world's visual signal, same as
    # examples/train_fake_world.py) can render
    map_xodr = FALLBACK_XODR
    if cfg.get("map"):
        with open(cfg["map"]) as f:
            map_xodr = f.read()
    rough_map = None
    birdview = None
    try:
        from mmfn_tpu.mapping import vectorize_xodr

        rough_map, birdview, _ = vectorize_xodr(map_xodr)
    except Exception as e:
        # an explicitly configured map MUST vectorize — otherwise signals,
        # NPC traffic, and the outside-lanes penalty would silently vanish
        # and scores would stop being comparable
        if cfg.get("map"):
            raise
        print(f"{bc.WARNING}map vectorization unavailable ({e}); running "
              f"without signals/traffic/lane penalties{bc.ENDC}")

    xcfg = None
    if is_xosc:
        from mmfn_tpu.harness.openscenario import hero_trajectory, parse_xosc
        from mmfn_tpu.harness.route import RouteConfig

        # rough_map (when `map:` is configured) enables LanePosition
        # resolution through the vectorizer's rmap v3 ids
        xcfg = parse_xosc(cfg["routes"], rough_map=rough_map)
        trajectory = [(x, y, 0.0) for x, y in hero_trajectory(xcfg, rough_map)]
        route_id = os.path.splitext(os.path.basename(cfg["routes"]))[0]
        indexer = RouteIndexer.from_configs(
            [RouteConfig(route_id=route_id, town=xcfg.town or "XoscWorld",
                         trajectory=trajectory)],
            repetitions=int(cfg.get("repetitions", 1)))
        if cfg.get("resume"):
            indexer.resume(endpoint)

    def route_kwargs(config):
        """Per-route drive() kwargs: scenario triggers, signals, traffic,
        the birdview camera, and (for .xosc) a fresh storyboard manager."""
        scenario_manager = None
        if is_xosc:
            from mmfn_tpu.harness.openscenario import OpenScenarioManager

            # fresh manager per repetition over the shared parsed config
            # (fired-state and actor state live on the manager)
            scenario_manager = OpenScenarioManager(xcfg)
        triggers = None
        if not is_xosc and cfg.get("scenarios"):
            from mmfn_tpu.harness.route import interpolate_trajectory
            from mmfn_tpu.harness.scenarios import (
                parse_scenario_file, sample_scenarios, scan_route_for_scenarios)

            triggers = parse_scenario_file(cfg["scenarios"], config.town)
            if cfg.get("route_scenario_sampling", True):
                # reference flow: match town triggers to THIS route, then
                # sample one scenario per position (route_scenario.py:304-357);
                # the repetition index seeds the fallback choices
                route_xy = [p for p, _ in
                            interpolate_trajectory(config.trajectory)]
                triggers = sample_scenarios(
                    scan_route_for_scenarios(route_xy, triggers),
                    seed=config.index)
        signals = None
        if rough_map is not None and cfg.get("signals", True):
            from mmfn_tpu.harness.replay import plan_from_trajectory
            from mmfn_tpu.harness.traffic import signals_from_rough_map

            _, world_plan = plan_from_trajectory(config.trajectory)
            signals = signals_from_rough_map(rough_map, [p for p, _ in world_plan])
        background = None
        bg_amount = int(cfg.get("background_traffic", 0))
        if rough_map is not None and bg_amount > 0:
            from mmfn_tpu.harness.npc_traffic import BackgroundTraffic

            background = BackgroundTraffic(
                [lane.nodes for lane in rough_map.lanes], bg_amount,
                seed=config.index, signals=signals,
                ego_start=config.trajectory[0][:2])
        max_ticks = cfg.get("max_ticks")
        # weather: the .xosc EnvironmentAction preset, the route XML's
        # per-route <weather> element (route_parser.py:62-110 — overrides
        # the global knob like the reference), or the eval.yaml `weather:`
        # knob — rain degrades the fake world's lidar and adds radar
        # clutter (KinematicWorld.RAIN_LEVELS)
        if is_xosc and xcfg.weather:
            weather = xcfg.weather
        else:
            weather = (getattr(config, "weather", None)
                       or cfg.get("weather") or "ClearNoon")
        # weather_animation: sun position evolves over game time (srunner
        # weather_sim.py analog); value = time compression factor (true/1
        # = real-time like the reference, 60 = a minute of route per hour
        # of sun) — the live preset re-derives from the sun altitude
        weather_sim = None
        anim = cfg.get("weather_animation")
        if anim:
            from mmfn_tpu.harness.weather import WeatherSim

            weather_sim = WeatherSim(
                preset=weather,
                time_scale=1.0 if anim is True else float(anim),
                start_hour=float(cfg.get("weather_start_hour", 11.0)))
        world_kwargs = {"camera_birdview": birdview, "weather": weather}
        if cfg.get("agent", {}).get("device_world"):
            # on-device sensor synthesis: the world skips host synthesis and
            # emits one compact world_state frame per tick
            world_kwargs["compact_sensors"] = True
        return dict(triggers=triggers, rough_map=rough_map, signals=signals,
                    background=background,
                    world_kwargs=world_kwargs,
                    scenario_manager=scenario_manager,
                    weather_sim=weather_sim,
                    max_ticks=None if max_ticks is None else int(max_ticks))

    shared = {}
    # generous default wall budget: the first route pays the XLA compile
    # (minutes cold); without headroom it would be scored as a timeout
    wall_budget = float(cfg.get("max_wall_seconds", 900.0))
    runner = ClosedLoopRunner(statistics, max_wall_seconds=wall_budget)
    # fleet: N — serving-scale extension (harness/fleet.py): drive up to N
    # routes in lockstep with ONE batched device forward per tick instead of
    # the reference's strictly sequential route loop. e2e agents only.
    fleet_n = max(1, int(cfg.get("fleet", 1)))
    t0 = time.time()
    while indexer.peek():
        configs = []
        while indexer.peek() and len(configs) < fleet_n:
            configs.append(indexer.next())
        if len(configs) > 1:
            from mmfn_tpu.harness.fleet import FleetRunner

            agents = [build_agent(cfg, shared, route_index=c.index)
                      for c in configs]
            if not all(hasattr(a, "prepare_step") for a in agents):
                raise SystemExit("fleet: N needs agents with the "
                                 "prepare_step/finish_step split "
                                 "(agent.type=e2e)")
            print(f"{bc.OKCYAN}fleet of {len(configs)}: routes "
                  f"{', '.join(c.route_id for c in configs)}{bc.ENDC}")
            # agent.async_dispatch=true selects the pipelined fleet (steer
            # from the previous tick's batched forward, docs/PARITY.md)
            try:
                records = FleetRunner(
                    statistics, max_wall_seconds=wall_budget,
                    pipelined=bool(cfg["agent"].get("async_dispatch", False)),
                ).run(agents, [dict(config=c, opendrive_str=map_xodr,
                                    **route_kwargs(c)) for c in configs])
            finally:
                for a in agents:     # release async-dispatch fetcher threads
                    a.destroy()
        else:
            config = configs[0]
            agent = build_agent(cfg, shared, route_index=config.index)
            # expert collection with repetitions>1: start later repetitions
            # laterally offset so the dataset carries recovery-to-lane
            # demonstrations (collect_offsets: true, the covariate-shift fix
            # the demo measures — see harness/route.py:offset_route_start)
            if cfg.get("collect_offsets") \
                    and cfg["agent"].get("type") in ("expert", "auto"):
                from mmfn_tpu.harness.route import (collect_offset_for,
                                                    offset_route_start)

                reps = max(1, int(cfg.get("repetitions", 1)))
                rep = config.index // max(1, indexer.total // reps)
                lateral = collect_offset_for(rep)
                if lateral:
                    config.trajectory = offset_route_start(
                        config.trajectory, lateral)
                    print(f"{bc.OKCYAN}collect offset {lateral:+.1f} m "
                          f"(rep {rep}){bc.ENDC}")
            print(f"{bc.OKCYAN}route {config.route_id} "
                  f"({config.index + 1}/{indexer.total}){bc.ENDC}")
            # record: DIR — per-route ground-truth recordings for post-hoc
            # metrics (run_steps/metrics_run.py), named like the reference's
            # recorder logs (leaderboard_evaluator.py:319-320:
            # "{record}/{name}_rep{index}.log"). Sequential routes only.
            recorder = None
            if cfg.get("record"):
                from mmfn_tpu.harness.recording import EpisodeRecorder

                recorder = EpisodeRecorder()
            try:
                records = [runner.run_route(agent, config, map_xodr,
                                            recorder=recorder,
                                            **route_kwargs(config))]
            finally:
                agent.destroy()      # agents are per-route; free the fetcher
            if recorder is not None:
                os.makedirs(cfg["record"], exist_ok=True)
                rec_path = os.path.join(
                    cfg["record"],
                    f"{config.route_id}_rep{config.index}.json")
                recorder.save(rec_path)
                print(f"recording written to {rec_path}")
        for config, record in zip(configs, records):
            statistics.save_record(record, config.index, endpoint)
            print(format_route_record(record, title=f"route {config.route_id}"))
        indexer.save_state(endpoint)

    global_record = statistics.compute_global_statistics(indexer.total)
    statistics.save_global_record(global_record, indexer.total, endpoint)
    print(format_global_summary(statistics.records))
    print(f"{bc.OKGREEN}driving score: {global_record.scores['score_composed']:.2f} "
          f"({time.time() - t0:.0f}s){bc.ENDC}")


if __name__ == "__main__":
    main()
