#!/usr/bin/env python
"""Record a closed-loop episode as a birdview GIF.

Runs any agent type over a route in the fake world (same scored loop phase0
uses) while rasterizing the privileged ground truth — ego, scenario + NPC
actors, traffic-light states — through the birdview producer every few
ticks, then writes an animated GIF. Visual evidence of the closed loop the
way the reference's ``carla_birdeye_view/__main__.py`` previews its masks.

Usage:
    python scripts/record_episode.py --route data/routes/cross_left_turn.xml \
        --map data/maps/fake_town_cross.xodr --traffic 4 \
        --out docs/img/cross_episode.gif
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--route", required=True, help="route XML")
    ap.add_argument("--map", default=None, help="OpenDRIVE map (default: "
                                                "straight road)")
    ap.add_argument("--agent", default="expert")
    ap.add_argument("--traffic", type=int, default=0,
                    help="background NPC vehicles")
    ap.add_argument("--scenario", default=None,
                    help="optional scenario class triggered mid-route")
    ap.add_argument("--trigger-s", type=float, default=60.0)
    ap.add_argument("--every", type=int, default=4,
                    help="render every Nth tick (20 Hz sim -> 5 fps default)")
    ap.add_argument("--out", default="episode.gif")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "run_steps"))
    from phase0_run_eval import FALLBACK_XODR, build_agent
    from scenario_run import _pose_along
    from mmfn_tpu.harness.replay import ClosedLoopRunner, route_environment
    from mmfn_tpu.harness.result_writer import format_route_record
    from mmfn_tpu.harness.route import RouteIndexer
    from mmfn_tpu.harness.scenarios import ScenarioTrigger, actor_half_extents
    from mmfn_tpu.mapping import vectorize_xodr
    from mmfn_tpu.mapping.birdview import BirdViewProducer

    map_xodr = FALLBACK_XODR
    if args.map:
        with open(args.map) as f:
            map_xodr = f.read()
    rough_map, producer, _ = vectorize_xodr(map_xodr)

    config = RouteIndexer(args.route).next()
    signals, background = route_environment(rough_map, config.trajectory,
                                            traffic=args.traffic)
    triggers = None
    if args.scenario:
        tx, ty, tyaw = _pose_along(config.trajectory, args.trigger_s)
        triggers = [ScenarioTrigger(x=tx, y=ty, yaw=tyaw,
                                    scenario_type=args.scenario)]

    agent = build_agent({"agent": {"type": args.agent, "variant": "vec"}},
                        shared={}, route_index=0)
    frames = []
    tick = [0]
    orig_run_step = agent.run_step

    def run_step(input_data, timestamp):
        if "privileged" in input_data and tick[0] % args.every == 0:
            _, p = input_data["privileged"]
            ex, ey, eyaw, _ = p["ego"]
            boxes, walkers = [], []
            for a in p["actors"]:
                if not a.visible_graphics:
                    continue
                hl, hw = actor_half_extents(a)
                row = (float(a.position[0]), float(a.position[1]),
                       float(a.yaw), 2 * hl, 2 * hw)
                (walkers if a.kind == "walker" else boxes).append(row)
            masks = producer.produce([ex, ey, eyaw], actors=boxes,
                                     walkers=walkers,
                                     lights=p["light_states"])
            frames.append(BirdViewProducer.as_rgb(masks))
        tick[0] += 1
        return orig_run_step(input_data, timestamp)

    agent.run_step = run_step
    runner = ClosedLoopRunner(max_wall_seconds=600)
    try:
        record = runner.run_route(agent, config, map_xodr, triggers=triggers,
                                  rough_map=rough_map, signals=signals,
                                  background=background)
    finally:
        agent.destroy()
    print(format_route_record(record, title=f"recorded {config.route_id}"))

    from PIL import Image

    imgs = [Image.fromarray(np.asarray(f)) for f in frames]
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    imgs[0].save(args.out, save_all=True, append_images=imgs[1:],
                 duration=int(args.every * 50), loop=0)
    print(f"wrote {args.out} ({len(imgs)} frames)")


if __name__ == "__main__":
    main()
