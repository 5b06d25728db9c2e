"""Birdview rasterizer tests over a synthetic .rmap."""

import math

import numpy as np
import pytest

from mmfn_tpu.mapping import RoughMap, write_rmap
from mmfn_tpu.mapping.birdview import (
    BirdViewProducer, CENTERLINES, EGO, ROAD, VEHICLES)


@pytest.fixture
def rmap(tmp_path):
    nodes = np.array([[i * 5.0, 0.0, 0, 0, 0] for i in range(20)])  # x axis lane
    poly = np.array([[-2, -2], [97, -2], [97, 2], [-2, 2]])
    nodes2 = np.array([[0.0, i * 5.0, 0, 0, 0] for i in range(20)])  # y axis lane
    poly2 = np.array([[-2, -2], [2, -2], [2, 97], [-2, 97]])
    path = str(tmp_path / "a.rmap")
    write_rmap(path, [(poly, nodes), (poly2, nodes2)])
    return RoughMap().read(path)


def test_masks_shape_and_ego(rmap):
    bev = BirdViewProducer(rmap, target_size=256, pixels_per_meter=8)
    masks = bev.produce([20.0, 0.0, 0.0])
    from mmfn_tpu.mapping.birdview import N_MASKS
    assert masks.shape == (256, 256, N_MASKS)
    # ego drawn at the center
    assert masks[128, 128, EGO] > 0
    # the lane under the ego is road
    assert masks[128, 128, ROAD] > 0
    assert masks[..., CENTERLINES].sum() > 0


def test_heading_up_rotation(rmap):
    bev = BirdViewProducer(rmap, target_size=256, pixels_per_meter=8)
    # heading along +x: the road ahead must appear ABOVE the center (heading-up)
    masks = bev.produce([20.0, 0.0, 0.0])
    col = masks[:, 128, ROAD]
    assert col[:128].sum() > 0  # road ahead visible above center
    # rotate the ego 90 deg: the same road must still be under the ego
    masks_rot = bev.produce([20.0, 0.0, math.pi / 2])
    assert masks_rot[128, 128, ROAD] > 0


def test_vehicle_overlay_and_rgb(rmap):
    bev = BirdViewProducer(rmap, target_size=256, pixels_per_meter=8)
    # a vehicle 10 m ahead of the ego on the same lane
    masks = bev.produce([20.0, 0.0, 0.0], actors=[(30.0, 0.0, 0.0, 4.5, 2.0)])
    assert masks[..., VEHICLES].sum() > 0
    ys, xs = np.nonzero(masks[..., VEHICLES])
    assert ys.mean() < 128  # ahead -> upper half (heading-up)
    rgb = BirdViewProducer.as_rgb(masks)
    assert rgb.shape == (256, 256, 3)
    assert rgb.max() > 0


def test_static_cache(tmp_path, rmap):
    nodes = np.array([[i * 5.0, 0.0, 0, 0, 0] for i in range(10)])
    poly = np.array([[-2, -2], [47, -2], [47, 2], [-2, 2]])
    path = str(tmp_path / "b.rmap")
    write_rmap(path, [(poly, nodes)])
    a = BirdViewProducer.from_opendrive(path)
    b = BirdViewProducer.from_opendrive(path)
    assert a is b


def test_light_masks_render_states(rmap):
    from mmfn_tpu.mapping.birdview import GREEN_LIGHTS, RED_LIGHTS, YELLOW_LIGHTS

    bev = BirdViewProducer(rmap, target_size=256, pixels_per_meter=8)
    lights = [(25.0, 0.0, "red"), (30.0, 0.0, "green"), (35.0, 0.0, "yellow")]
    masks = bev.produce([20.0, 0.0, 0.0], lights=lights)
    assert masks[..., RED_LIGHTS].sum() > 0
    assert masks[..., GREEN_LIGHTS].sum() > 0
    assert masks[..., YELLOW_LIGHTS].sum() > 0
    # heading-up frame: ego faces +x in the world -> lights ahead are above
    ys = np.nonzero(masks[..., RED_LIGHTS])[0]
    assert ys.mean() < 128
    rgb = BirdViewProducer.as_rgb(masks)
    assert (rgb == np.array([255, 60, 60])).all(axis=-1).any()
