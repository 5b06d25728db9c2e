#!/usr/bin/env python
"""End-to-end learning demo, no CARLA required.

1. The rule-based expert drives routes in the kinematic fake world (with the
   deterministic birdview camera) and records a dataset at 2 Hz.
2. phase-1 preprocessing pickles the samples.
3. An MMFN-vec policy trains on them (data-parallel over local devices).
4. The trained policy drives a held-out route closed-loop and is scored
   against a random-init policy.

This exercises every layer of the framework end to end: native map
vectorization, expert + writer, dataset, engine, jitted inference, PID,
criteria, scoring.

Usage:
    python examples/train_fake_world.py [--epochs 30] [--n-layer 2] [--out /tmp/demo]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# persistent compile cache: the full train-step + inference-pipeline compiles
# dominate demo wall-clock on a cold start (TPU backend only: reloading cached
# XLA:CPU executables can abort on machine-feature mismatch, see CLAUDE.md)
from mmfn_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.collate import data_loader
from mmfn_tpu.data.dataset import CarlaDataset, PreprocessedDataset, preprocess_to_pickles
from mmfn_tpu.harness.agents import MMFNAgent
from mmfn_tpu.harness.experts.agent import ExpertCollectionAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.models import build_model
from mmfn_tpu.train import Engine, create_train_state

XODR = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE><header revMajor="1" revMinor="4" name="line"/>
<road name="R0" length="600.0" id="0" junction="-1">
<planView><geometry s="0.0" x="-50.0" y="0.0" hdg="0.0" length="600.0"><line/></geometry></planView>
<lanes><laneSection s="0.0"><center><lane id="0" type="none" level="false"/></center>
<right><lane id="-1" type="driving" level="false"><width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/></lane></right>
<left><lane id="1" type="driving" level="false"><width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/></lane></left>
</laneSection></lanes></road></OpenDRIVE>
"""

# forward routes on the right lane (y=+1.75), reverse on the left (y=-1.75)
COLLECT_ROUTES = [
    [(0.0, 1.75, 0.0), (180.0, 1.75, 0.0)],
    [(60.0, 1.75, 0.0), (260.0, 1.75, 0.0)],
    [(150.0, 1.75, 0.0), (330.0, 1.75, 0.0)],
    [(300.0, -1.75, 0.0), (100.0, -1.75, 0.0)],
    [(200.0, -1.75, 0.0), (20.0, -1.75, 0.0)],
]
EVAL_ROUTE = [(30.0, 1.75, 0.0), (210.0, 1.75, 0.0)]

# --map loop: the shipped signalized circuit (data/maps/fake_town_loop.xodr)
# with collection segments covering its straights AND arcs, so the policy
# sees turning data; evaluation is a held-out quarter of the ring.
LOOP_XODR_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "maps", "fake_town_loop.xodr")
LOOP_ROUTE_PATH = os.path.join(os.path.dirname(LOOP_XODR_PATH),
                               os.pardir, "routes", "fake_loop.xml")


def _loop_routes():
    """Collection segments = the first three quarters of the shipped ring
    route (keypoints follow the lane through the arcs, so interpolation stays
    on the road); evaluation = the truly held-out last quarter."""
    from mmfn_tpu.harness.route import parse_routes_file

    ring = list(parse_routes_file(LOOP_ROUTE_PATH)[0].trajectory)
    n = len(ring)
    seg = n // 4
    collect = [ring[i * seg:(i + 1) * seg + 1] for i in range(3)]
    eval_route = ring[3 * seg:] + ring[:1]      # closing quarter, unseen
    return collect, eval_route


# --map cross: the signalized 4-way junction (scripts/gen_cross_town.py).
# Collection covers both straights and the RIGHT-turn arc; evaluation is the
# held-out LEFT turn — an unseen junction movement, not just unseen road.
CROSS_XODR_PATH = os.path.join(os.path.dirname(LOOP_XODR_PATH),
                               "fake_town_cross.xodr")


def _cross_routes():
    from mmfn_tpu.harness.route import parse_routes_file

    routes_dir = os.path.join(os.path.dirname(CROSS_XODR_PATH),
                              os.pardir, "routes")

    def load(name):
        return list(parse_routes_file(
            os.path.join(routes_dir, name))[0].trajectory)

    collect = [load("cross_straight.xml"), load("cross_straight_sn.xml"),
               load("cross_right_turn.xml")]
    return collect, load("cross_left_turn.xml")


def make_background(rmap_path, amount, seed, ego_start=None, signals=None):
    if amount <= 0:
        return None
    from mmfn_tpu.harness.npc_traffic import BackgroundTraffic
    from mmfn_tpu.mapping import RoughMap

    lanes = [l.nodes for l in RoughMap().read(rmap_path).lanes]
    return BackgroundTraffic(lanes, amount, seed=seed, ego_start=ego_start,
                             signals=signals)


def make_signals(rmap_path, trajectory):
    """Traffic lights derived from the map's signal-controlled nodes along
    the route (None when the map has no signals, e.g. the straight road)."""
    from mmfn_tpu.harness.replay import plan_from_trajectory
    from mmfn_tpu.harness.traffic import signals_from_rough_map
    from mmfn_tpu.mapping import RoughMap

    _, world_plan = plan_from_trajectory(trajectory)
    signals = signals_from_rough_map(RoughMap().read(rmap_path),
                                     [p for p, _ in world_plan])
    return signals if (signals.lights or signals.stop_signs) else None


def make_map(out_dir):
    from mmfn_tpu.mapping import vectorize_xodr

    _, birdview, rmap_path = vectorize_xodr(
        XODR, work_dir=os.path.join(out_dir, "map"))
    return rmap_path, birdview


# recovery offsets live in the harness now (phase0 collect_offsets uses the
# same schedule): harness/route.py offset_route_start / collect_offset_for
from mmfn_tpu.harness.route import collect_offset_for, offset_route_start

_offset_start = offset_route_start


def collect(out_dir, birdview, cfg, rmap_path, traffic=0, repetitions=1):
    town_dir = os.path.join(out_dir, "TownFake_short")
    runner = ClosedLoopRunner(max_wall_seconds=120)
    n = 0
    for rep in range(repetitions):
        # rep 0 drives on-lane; later reps start offset by alternating ±0.9 m
        lateral = collect_offset_for(rep)
        for i, traj in enumerate(COLLECT_ROUTES):
            agent = ExpertCollectionAgent({
                "config": cfg,
                "save_path": os.path.join(town_dir, f"route_{n:02d}"),
                "image_ext": "npy", "seed": i + 31 * rep,
                "tmp_dir": os.path.join(out_dir, f"expert_map_{n}")})
            run_traj = _offset_start(traj, lateral)
            signals = make_signals(rmap_path, run_traj)
            record = runner.run_route(
                agent, RouteConfig(str(n), "TownFake", run_traj, 0), XODR,
                background=make_background(rmap_path, traffic, seed=i + 31 * rep,
                                           ego_start=run_traj[0][:2],
                                           signals=signals),
                signals=signals,
                world_kwargs={"camera_birdview": birdview})
            print(f"collect route {n} (rep {rep}, offset {lateral:+.1f}): "
                  f"{record.status}, score {record.scores['score_composed']:.0f}")
            n += 1
    return town_dir


def evaluate(variables, model, cfg, birdview, label, rmap_path, traffic=0,
             variant="vec"):
    agent = MMFNAgent({"variant": variant, "model": model, "variables": variables,
                       "config": cfg, "points_per_sweep": 2048})
    runner = ClosedLoopRunner(max_wall_seconds=240)
    signals = make_signals(rmap_path, EVAL_ROUTE)
    record = runner.run_route(
        agent, RouteConfig("eval", "TownFake", EVAL_ROUTE, 0), XODR,
        background=make_background(rmap_path, traffic, seed=99,
                                   ego_start=EVAL_ROUTE[0][:2], signals=signals),
        signals=signals,
        world_kwargs={"camera_birdview": birdview})
    print(f"{label}: {record.status}, driving score "
          f"{record.scores['score_composed']:.1f} "
          f"(completion {record.scores['score_route']:.1f}%)")
    return record.scores["score_composed"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/mmfn_tpu_demo")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-layer", type=int, default=2)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--traffic", type=int, default=0,
                    help="ambient NPC vehicles during collect AND eval")
    ap.add_argument("--repetitions", type=int, default=1,
                    help="collection passes over the routes; passes beyond "
                         "the first start laterally offset to record "
                         "recovery demonstrations")
    ap.add_argument("--map", choices=["straight", "loop", "cross"],
                    default="straight",
                    help="fake-world map: straight road, the signalized "
                         "loop, or the 4-way junction (train on straights + "
                         "the right turn, evaluate on the held-out left "
                         "turn)")
    ap.add_argument("--variant", choices=["img", "vec", "rad"], default="vec",
                    help="MMFN variant to train (rad = the full 4-modality graph)")
    args = ap.parse_args()

    global XODR, COLLECT_ROUTES, EVAL_ROUTE
    if args.map == "loop":
        with open(LOOP_XODR_PATH) as f:
            XODR = f.read()
        COLLECT_ROUTES, EVAL_ROUTE = _loop_routes()
    elif args.map == "cross":
        with open(CROSS_XODR_PATH) as f:
            XODR = f.read()
        COLLECT_ROUTES, EVAL_ROUTE = _cross_routes()
    cfg = GlobalConfig(n_layer=args.n_layer, max_lanes=16, lr=3e-4)
    t0 = time.time()
    rmap_path, birdview = make_map(args.out)

    town_dir = collect(args.out, birdview, cfg, rmap_path,
                       traffic=args.traffic, repetitions=args.repetitions)
    ds = CarlaDataset([town_dir], cfg, image_ext="npy")
    print(f"collected {len(ds)} samples in {time.time() - t0:.0f}s")
    pro = os.path.join(args.out, "pro_train")
    preprocess_to_pickles(ds, pro, workers=4)
    train_set = PreprocessedDataset(pro)

    model = build_model(cfg, args.variant)
    if len(train_set) < args.batch:
        raise SystemExit(f"collected only {len(train_set)} frames < batch "
                         f"{args.batch}; add routes or --repetitions")
    sample = next(data_loader(train_set, args.batch, cfg.max_lanes, num_threads=1))
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), sample)
    untrained = {"params": jax.tree.map(np.asarray, dict(state.params)),
                 "batch_stats": jax.tree.map(np.asarray, dict(state.batch_stats))}

    engine = Engine(model, cfg, os.path.join(args.out, "log"))
    rng = jax.random.PRNGKey(1)
    t1 = time.time()
    for epoch in range(args.epochs):
        state = engine.train(
            state, data_loader(train_set, args.batch, cfg.max_lanes,
                               shuffle=True, seed=epoch, num_threads=2), rng)
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: loss {engine.train_loss[-1]:.3f}")
    print(f"trained {args.epochs} epochs in {time.time() - t1:.0f}s "
          f"on {jax.default_backend()}")
    engine.validate(state, data_loader(train_set, args.batch, cfg.max_lanes,
                                       num_threads=1))
    engine.save(state)

    trained = {"params": state.params, "batch_stats": state.batch_stats}
    score_untrained = evaluate(untrained, model, cfg, birdview,
                               "random-init policy", rmap_path, args.traffic,
                               variant=args.variant)
    score_trained = evaluate(trained, model, cfg, birdview,
                             "trained policy", rmap_path, args.traffic,
                             variant=args.variant)
    print(f"driving score: untrained {score_untrained:.1f} -> "
          f"trained {score_trained:.1f}")


if __name__ == "__main__":
    main()
