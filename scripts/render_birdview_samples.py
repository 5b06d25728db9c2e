#!/usr/bin/env python
"""Render birdview mask/RGB samples for visual comparison with the
reference's carla_birdeye_view output (VERDICT round-1 #5 'visually
comparable').

Writes docs/img/birdview_{straight,loop}.png: each a side-by-side of the
RGB composite and the ROAD/LANES/CENTERLINES static layers around a pose on
(a) a straight two-purpose test road and (b) the shipped signalized loop
town (data/maps/fake_town_loop.xodr), with vehicles, a pedestrian, and a
red light overlaid.

Usage: python scripts/render_birdview_samples.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render(xodr: str, pose, out_path: str) -> None:
    import cv2

    from mmfn_tpu.mapping import vectorize_xodr
    from mmfn_tpu.mapping.birdview import (
        BirdViewProducer, CENTERLINES, LANES, ROAD)

    _, producer, _ = vectorize_xodr(xodr)
    x, y, yaw = pose
    masks = producer.produce(
        [x, y, yaw],
        actors=[(x + 13.0, y, yaw, 4.5, 2.0), (x - 8.0, y - 3.5, yaw, 4.5, 2.0)],
        walkers=[(x + 8.0, y + 4.0, yaw, 0.8, 0.8)],
        lights=[(x + 10.0, y + 2.0, "red")])
    rgb = BirdViewProducer.as_rgb(masks)
    layers = [rgb] + [
        cv2.cvtColor(masks[..., i], cv2.COLOR_GRAY2BGR)
        for i in (ROAD, LANES, CENTERLINES)]
    panel = np.concatenate(layers, axis=1)
    cv2.imwrite(out_path, panel[..., ::-1])
    print("wrote", out_path, panel.shape)


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "docs", "img")
    os.makedirs(out_dir, exist_ok=True)

    from tests.test_harness import STRAIGHT_XODR

    render(STRAIGHT_XODR, (30.0, 1.75, 0.0),
           os.path.join(out_dir, "birdview_straight.png"))

    loop_path = os.path.join(root, "data", "maps", "fake_town_loop.xodr")
    if os.path.exists(loop_path):
        with open(loop_path) as f:
            render(f.read(), (30.0, 1.75, 0.0),
                   os.path.join(out_dir, "birdview_loop.png"))

    # crossroads town: ego on the west approach looking into the junction
    cross_path = os.path.join(root, "data", "maps", "fake_town_cross.xodr")
    if os.path.exists(cross_path):
        with open(cross_path) as f:
            render(f.read(), (-14.0, 1.75, 0.0),
                   os.path.join(out_dir, "birdview_cross.png"))


if __name__ == "__main__":
    main()
