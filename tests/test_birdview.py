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
    from mmfn_tpu.mapping.birdview import _PALETTE

    assert (rgb == np.array(_PALETTE[RED_LIGHTS])).all(axis=-1).any()


def test_variable_width_road_mask(tmp_path):
    """rmap v2 width column -> the road ribbon follows each lane's own width
    (reference draws lane polygons from waypoint widths, mask.py:68-144)."""
    from mmfn_tpu.mapping.birdview import LANES

    # lane A: 3.5 m wide; lane B (parallel, 20 m away): 7 m wide
    nodes_a = np.array([[i * 5.0, 0.0, 0, 0, 0, 3.5] for i in range(10)])
    poly_a = np.array([[-2, -4], [47, -4], [47, 4], [-2, 4]])
    nodes_b = np.array([[i * 5.0, 20.0, 0, 0, 0, 7.0] for i in range(10)])
    poly_b = np.array([[-2, 16], [47, 16], [47, 24], [-2, 24]])
    path = str(tmp_path / "w.rmap")
    write_rmap(path, [(poly_a, nodes_a), (poly_b, nodes_b)], header="rmap v2")
    rm = RoughMap().read(path)
    assert rm.lanes[0].widths is not None
    assert rm.lanes[0].nodes.shape[1] == 5          # feature contract intact

    bev = BirdViewProducer(rm, target_size=256, pixels_per_meter=8)
    masks = bev.produce([20.0, 10.0, 0.0])
    # heading-up: the x-axis lanes render as vertical bands left (lane A at
    # world y=0 -> image right) and right of the ego; band widths track the
    # lane widths (~28 px vs ~56 px at 8 px/m)
    road_cols = (masks[..., ROAD] > 0).sum(axis=0)
    bands = np.flatnonzero(road_cols)
    assert len(bands) > 0
    # lane-marking boundaries exist and differ from centerlines
    assert masks[..., LANES].sum() > 0
    assert (masks[..., LANES] != masks[..., CENTERLINES]).any()


def test_road_width_scales_with_lane_width(tmp_path):
    """Road band thickness tracks the width column quantitatively."""
    def band_height(width_m):
        nodes = np.array([[i * 5.0, 0.0, 0, 0, 0, width_m] for i in range(10)])
        poly = np.array([[-2, -8], [47, -8], [47, 8], [-2, 8]])
        path = str(tmp_path / f"w{width_m}.rmap")
        write_rmap(path, [(poly, nodes)], header="rmap v2")
        bev = BirdViewProducer(RoughMap().read(path), target_size=256,
                               pixels_per_meter=8)
        masks = bev.produce([20.0, 0.0, 0.0])
        return (masks[128:129, :, ROAD] > 0).sum()

    h35, h70 = band_height(3.5), band_height(7.0)
    assert 1.7 < h70 / h35 < 2.3, (h35, h70)


def test_pedestrian_mask_separate(rmap):
    from mmfn_tpu.mapping.birdview import PEDESTRIANS, _PALETTE

    bev = BirdViewProducer(rmap, target_size=256, pixels_per_meter=8)
    masks = bev.produce([20.0, 0.0, 0.0],
                        actors=[(30.0, 0.0, 0.0, 4.5, 2.0)],
                        walkers=[(25.0, 2.0, 0.0, 1.0, 1.0)])
    assert masks[..., PEDESTRIANS].sum() > 0
    assert masks[..., VEHICLES].sum() > 0
    # walkers never leak into the vehicle mask
    overlap = (masks[..., PEDESTRIANS] > 0) & (masks[..., VEHICLES] > 0)
    assert not overlap.any()
    rgb = BirdViewProducer.as_rgb(masks)
    assert (rgb == np.array(_PALETTE[PEDESTRIANS])).all(axis=-1).any()


def test_on_disk_static_cache(tmp_path):
    """cache_dir persists static layers; a fresh producer restored from disk
    renders identically (reference ~/birdview_v3_cache, __init__.py:162-198)."""
    import mmfn_tpu.mapping.birdview as bv

    nodes = np.array([[i * 5.0, 0.0, 0, 0, 0, 3.5] for i in range(10)])
    poly = np.array([[-2, -4], [47, -4], [47, 4], [-2, 4]])
    path = str(tmp_path / "c.rmap")
    write_rmap(path, [(poly, nodes)], header="rmap v2")
    cache = str(tmp_path / "bv_cache")

    a = BirdViewProducer.from_opendrive(path, cache_dir=cache)
    import os
    files = os.listdir(cache)
    assert len(files) == 1 and files[0].endswith(".npz")
    want = a.produce([20.0, 0.0, 0.0])

    bv._static_cache.clear()   # force the disk path
    b = BirdViewProducer.from_opendrive(path, cache_dir=cache)
    np.testing.assert_array_equal(b.produce([20.0, 0.0, 0.0]), want)
