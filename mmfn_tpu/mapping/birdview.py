"""Bird's-eye-view HD-map rasterizer.

Produces the 256x256 @ 8 px/m ego-centric map raster that feeds the MMFN img
variant's map stream (the reference vendors deepsense-ai's carla_birdeye_view,
team_code/expert_agent/common/carla_birdeye_view/, which rasterizes through
the CARLA map API). This implementation rasterizes straight from our own
OpenDRIVE vectorization (the .rmap lanes emitted by native/rough_map_node), so
it runs without a simulator:

- static layers are drawn once over the whole map: the ROAD mask fills
  variable-width lane polygons from the vectorizer's per-node width column
  (mask.py:68-144 walks CARLA waypoints; rmap v2 carries the same widths),
  LANES draws the lane-boundary markings, CENTERLINES the centerline
  polylines (lanes.py:52-150);
- the mask stack uses the reference's BirdViewMasks order (__init__.py:41-50):
  ROAD, LANES, CENTERLINES, VEHICLES, AGENT, GREEN/YELLOW/RED_LIGHTS,
  PEDESTRIANS — pedestrians are their own layer;
- static layers cache in memory by content hash AND optionally on disk
  (``cache_dir``, the reference's ~/birdview_v3_cache keyed by opendrive
  sha1, __init__.py:162-198);
- ``produce(pose, actors, walkers, lights)`` crops a rotation-safe square
  around the ego, overlays dynamic masks, rotates heading-up, center-crops;
- ``as_rgb`` applies the reference's palette draw order (bottom to top).
"""

from __future__ import annotations

import hashlib
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from mmfn_tpu.mapping.rough_map import RoughMap

LANE_WIDTH_M = 3.5     # fallback for v1 .rmap files without a width column

# mask indices — the reference's BirdViewMasks values (__init__.py:41-50)
ROAD = 0
LANES = 1              # lane-boundary markings
CENTERLINES = 2
VEHICLES = 3
AGENT = 4
GREEN_LIGHTS = 5
YELLOW_LIGHTS = 6
RED_LIGHTS = 7
PEDESTRIANS = 8
N_MASKS = 9
EGO = AGENT            # back-compat alias

# the reference's RGB_BY_MASK palette (__init__.py:61-71)
_PALETTE = {
    ROAD: (110, 110, 110),          # DIM_GRAY
    LANES: (255, 255, 255),         # WHITE
    CENTERLINES: (209, 92, 0),      # CHOCOLATE
    VEHICLES: (252, 175, 62),       # ORANGE
    AGENT: (138, 226, 52),          # CHAMELEON
    GREEN_LIGHTS: (78, 255, 78),    # GREEN
    YELLOW_LIGHTS: (252, 233, 79),  # YELLOW
    RED_LIGHTS: (255, 78, 78),      # RED
    PEDESTRIANS: (173, 127, 168),   # VIOLET
}
_LIGHT_MASK = {"red": RED_LIGHTS, "yellow": YELLOW_LIGHTS, "green": GREEN_LIGHTS}
LIGHT_RADIUS_M = 1.2

_static_cache: Dict[str, "BirdViewProducer"] = {}

# draw order for as_rgb: bottom to top (reference bottom_to_top())
_BOTTOM_TO_TOP = (ROAD, LANES, CENTERLINES, GREEN_LIGHTS, YELLOW_LIGHTS,
                  RED_LIGHTS, AGENT, VEHICLES, PEDESTRIANS)


def _boundaries(xy: np.ndarray, halfw: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Left/right lane boundaries of a centerline polyline.

    Per-node unit normals come from the averaged segment directions, so
    consecutive chunks (which share their boundary node) tile seamlessly."""
    d = np.gradient(xy, axis=0)
    norm = np.linalg.norm(d, axis=1, keepdims=True)
    d = d / np.maximum(norm, 1e-9)
    perp = np.stack([-d[:, 1], d[:, 0]], axis=1)
    off = perp * halfw[:, None]
    return xy + off, xy - off


class BirdViewProducer:
    def __init__(self, rough_map: Optional[RoughMap], target_size: int = 256,
                 pixels_per_meter: int = 8, _static=None):
        self.target_size = target_size
        self.ppm = pixels_per_meter
        # rotation-safe intermediate crop (corner distance of the target)
        self.crop_size = int(math.ceil(target_size * math.sqrt(2) / 2) * 2 + 2)

        if _static is not None:   # restored from the on-disk cache
            self.min_xy, self.size_px, self._road, self._lanes_mask, \
                self._center = _static
            return

        pts = np.concatenate([l.nodes[:, :2] for l in rough_map.lanes]) \
            if rough_map.lanes else np.zeros((1, 2))
        margin = 2 * target_size / pixels_per_meter
        self.min_xy = pts.min(axis=0) - margin
        max_xy = pts.max(axis=0) + margin
        self.size_px = np.maximum(
            ((max_xy - self.min_xy) * pixels_per_meter).astype(int) + 1, 64)

        self._road = np.zeros((self.size_px[1], self.size_px[0]), np.uint8)
        self._lanes_mask = np.zeros_like(self._road)
        self._center = np.zeros_like(self._road)
        for lane in rough_map.lanes:
            xy = lane.nodes[:, :2]
            if len(xy) < 2:
                continue
            halfw = (lane.widths / 2.0 if lane.widths is not None
                     else np.full(len(xy), LANE_WIDTH_M / 2.0))
            left, right = _boundaries(xy, halfw)
            ring = np.concatenate([left, right[::-1]], axis=0)
            cv2.fillPoly(self._road, [self._to_px(ring)], 255)
            # boundary markings: thin lines along both lane edges
            cv2.polylines(self._lanes_mask, [self._to_px(left)], False, 255, 1)
            cv2.polylines(self._lanes_mask, [self._to_px(right)], False, 255, 1)
            cv2.polylines(self._center, [self._to_px(xy)], False, 255, 1)

    @classmethod
    def from_opendrive(cls, rmap_path: str,
                       cache_dir: Optional[str] = None,
                       **kw) -> "BirdViewProducer":
        """Build from an .rmap file. Static layers cache in memory by content
        hash; pass ``cache_dir`` (or set MMFN_BIRDVIEW_CACHE) to also persist
        them on disk, like the reference's ~/birdview_v3_cache."""
        cache_dir = cache_dir or os.environ.get("MMFN_BIRDVIEW_CACHE")
        with open(rmap_path, "rb") as f:
            key = hashlib.sha1(f.read()).hexdigest() + str(sorted(kw.items()))
        if key in _static_cache:
            return _static_cache[key]

        producer = None
        disk_path = None
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            disk_path = os.path.join(
                cache_dir, hashlib.sha1(key.encode()).hexdigest() + ".npz")
            if os.path.exists(disk_path):
                z = np.load(disk_path)
                producer = cls(None, _static=(z["min_xy"], z["size_px"],
                                              z["road"], z["lanes_mask"],
                                              z["center"]), **kw)
        if producer is None:
            producer = cls(RoughMap().read(rmap_path), **kw)
            if disk_path is not None:
                np.savez_compressed(
                    disk_path, min_xy=producer.min_xy, size_px=producer.size_px,
                    road=producer._road, lanes_mask=producer._lanes_mask,
                    center=producer._center)
        _static_cache[key] = producer
        return producer

    # ---- coordinates ---------------------------------------------------------- #

    def _to_px(self, xy: np.ndarray) -> np.ndarray:
        px = (np.asarray(xy) - self.min_xy) * self.ppm
        return np.round(px).astype(np.int32)

    # ---- rasterization ---------------------------------------------------------- #

    def produce(self, pose2d: Sequence[float],
                actors: Optional[List[Tuple[float, float, float, float, float]]] = None,
                lights: Optional[List[Tuple[float, float, str]]] = None,
                walkers: Optional[List[Tuple[float, float, float, float, float]]] = None
                ) -> np.ndarray:
        """pose2d [x, y, theta]; actors/walkers: [(x, y, yaw, length, width)];
        lights: [(x, y, state)] with state in red|yellow|green (stop-line
        markers, the reference's 3-state light masks).

        Returns (target_size, target_size, N_MASKS) uint8 masks in
        BirdViewMasks order, ego centered and heading up.
        """
        x, y, theta = pose2d
        half = self.crop_size // 2
        cx, cy = self._to_px(np.array([[x, y]]))[0]

        def crop(canvas: np.ndarray) -> np.ndarray:
            out = np.zeros((self.crop_size, self.crop_size), np.uint8)
            x0, y0 = cx - half, cy - half
            sx0, sy0 = max(0, x0), max(0, y0)
            sx1 = min(canvas.shape[1], x0 + self.crop_size)
            sy1 = min(canvas.shape[0], y0 + self.crop_size)
            if sx1 > sx0 and sy1 > sy0:
                out[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = canvas[sy0:sy1, sx0:sx1]
            return out

        # dynamic actors drawn in the crop frame (contiguous buffers for cv2)
        def draw_box(mask, ax, ay, ayaw, length, width):
            corners = np.array([[length / 2, width / 2], [length / 2, -width / 2],
                                [-length / 2, -width / 2], [-length / 2, width / 2]])
            c, s = math.cos(ayaw), math.sin(ayaw)
            rot = np.array([[c, -s], [s, c]])
            world = corners @ rot.T + np.array([ax, ay])
            px = (world - np.array([x, y])) * self.ppm + half
            cv2.fillPoly(mask, [np.round(px).astype(np.int32)], 255)

        vehicles = np.zeros((self.crop_size, self.crop_size), np.uint8)
        for (ax, ay, ayaw, length, width) in actors or []:
            draw_box(vehicles, ax, ay, ayaw, length, width)
        peds = np.zeros_like(vehicles)
        for (ax, ay, ayaw, length, width) in walkers or []:
            draw_box(peds, ax, ay, ayaw, length, width)
        ego = np.zeros_like(vehicles)
        draw_box(ego, x, y, theta, 4.9, 2.1)

        light_masks = {GREEN_LIGHTS: np.zeros_like(vehicles),
                       YELLOW_LIGHTS: np.zeros_like(vehicles),
                       RED_LIGHTS: np.zeros_like(vehicles)}
        r_px = max(2, int(LIGHT_RADIUS_M * self.ppm))
        for (lx, ly, state) in lights or []:
            px = (np.array([lx, ly]) - np.array([x, y])) * self.ppm + half
            idx = _LIGHT_MASK.get(state, RED_LIGHTS)
            cv2.circle(light_masks[idx], tuple(np.round(px).astype(int)), r_px,
                       255, -1)

        masks = np.stack(
            [crop(self._road), crop(self._lanes_mask), crop(self._center),
             vehicles, ego, light_masks[GREEN_LIGHTS],
             light_masks[YELLOW_LIGHTS], light_masks[RED_LIGHTS], peds],
            axis=-1)

        # rotate so the ego heading points up, then center-crop
        angle_deg = math.degrees(theta) + 90.0
        rot_mat = cv2.getRotationMatrix2D((half, half), angle_deg, 1.0)
        rotated = cv2.warpAffine(masks, rot_mat, (self.crop_size, self.crop_size))
        if rotated.ndim == 2:
            rotated = rotated[..., None]
        off = (self.crop_size - self.target_size) // 2
        return rotated[off:off + self.target_size, off:off + self.target_size]

    @staticmethod
    def as_rgb(masks: np.ndarray) -> np.ndarray:
        rgb = np.zeros(masks.shape[:2] + (3,), np.uint8)
        for idx in _BOTTOM_TO_TOP:         # later layers draw on top
            if idx < masks.shape[-1]:
                rgb[masks[..., idx] > 0] = _PALETTE[idx]
        return rgb
