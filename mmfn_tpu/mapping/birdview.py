"""Bird's-eye-view HD-map rasterizer.

Produces the 256x256 @ 8 px/m ego-centric map raster that feeds the MMFN img
variant's map stream (the reference vendors deepsense-ai's carla_birdeye_view,
team_code/expert_agent/common/carla_birdeye_view/, which rasterizes through
the CARLA map API). This implementation rasterizes straight from our own
OpenDRIVE vectorization (the .rmap lanes emitted by native/rough_map_node), so
it runs without a simulator:

- static layers (road ribbon + centerlines) are drawn once over the whole map
  and cached in memory keyed by content hash (the reference caches to
  ~/birdview_v3_cache keyed by opendrive sha1, __init__.py:162-198);
- ``produce(pose, actors)`` crops a rotation-safe square around the ego,
  overlays dynamic actor masks, rotates heading-up, center-crops;
- ``as_rgb`` applies a fixed palette.
"""

from __future__ import annotations

import hashlib
import math
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from mmfn_tpu.mapping.rough_map import RoughMap

LANE_WIDTH_M = 3.5

# mask indices (the reference's bitmasks, __init__.py:41-50; PEDESTRIANS is
# folded into VEHICLES — fake-world walkers draw as actor boxes)
ROAD = 0
CENTERLINES = 1
VEHICLES = 2
EGO = 3
RED_LIGHTS = 4
YELLOW_LIGHTS = 5
GREEN_LIGHTS = 6
N_MASKS = 7

_PALETTE = {
    ROAD: (85, 85, 85),
    CENTERLINES: (255, 255, 255),
    VEHICLES: (0, 180, 255),
    EGO: (60, 250, 60),
    RED_LIGHTS: (255, 60, 60),
    YELLOW_LIGHTS: (255, 220, 60),
    GREEN_LIGHTS: (80, 255, 120),
}
_LIGHT_MASK = {"red": RED_LIGHTS, "yellow": YELLOW_LIGHTS, "green": GREEN_LIGHTS}
LIGHT_RADIUS_M = 1.2

_static_cache: Dict[str, "BirdViewProducer"] = {}


class BirdViewProducer:
    def __init__(self, rough_map: RoughMap, target_size: int = 256,
                 pixels_per_meter: int = 8):
        self.target_size = target_size
        self.ppm = pixels_per_meter
        # rotation-safe intermediate crop (corner distance of the target)
        self.crop_size = int(math.ceil(target_size * math.sqrt(2) / 2) * 2 + 2)

        pts = np.concatenate([l.nodes[:, :2] for l in rough_map.lanes]) \
            if rough_map.lanes else np.zeros((1, 2))
        margin = 2 * target_size / pixels_per_meter
        self.min_xy = pts.min(axis=0) - margin
        max_xy = pts.max(axis=0) + margin
        self.size_px = np.maximum(
            ((max_xy - self.min_xy) * pixels_per_meter).astype(int) + 1, 64)

        self._road = np.zeros((self.size_px[1], self.size_px[0]), np.uint8)
        self._center = np.zeros_like(self._road)
        lane_px = max(1, int(LANE_WIDTH_M * pixels_per_meter))
        for lane in rough_map.lanes:
            px = self._to_px(lane.nodes[:, :2])
            if len(px) >= 2:
                cv2.polylines(self._road, [px], False, 255, thickness=lane_px)
                cv2.polylines(self._center, [px], False, 255, thickness=1)

    @classmethod
    def from_opendrive(cls, rmap_path: str, **kw) -> "BirdViewProducer":
        """Build from an .rmap file with in-memory caching by content hash."""
        with open(rmap_path, "rb") as f:
            key = hashlib.sha1(f.read()).hexdigest() + str(sorted(kw.items()))
        if key not in _static_cache:
            _static_cache[key] = cls(RoughMap().read(rmap_path), **kw)
        return _static_cache[key]

    # ---- coordinates ---------------------------------------------------------- #

    def _to_px(self, xy: np.ndarray) -> np.ndarray:
        px = (np.asarray(xy) - self.min_xy) * self.ppm
        return np.round(px).astype(np.int32)

    # ---- rasterization ---------------------------------------------------------- #

    def produce(self, pose2d: Sequence[float],
                actors: Optional[List[Tuple[float, float, float, float, float]]] = None,
                lights: Optional[List[Tuple[float, float, str]]] = None
                ) -> np.ndarray:
        """pose2d [x, y, theta]; actors: [(x, y, yaw, length, width), ...];
        lights: [(x, y, state)] with state in red|yellow|green (stop-line
        markers, the reference's 3-state light masks).

        Returns (target_size, target_size, N_MASKS) uint8 masks, ego centered
        and heading up.
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
        ego = np.zeros_like(vehicles)
        draw_box(ego, x, y, theta, 4.9, 2.1)

        light_masks = [np.zeros_like(vehicles) for _ in range(3)]
        r_px = max(2, int(LIGHT_RADIUS_M * self.ppm))
        for (lx, ly, state) in lights or []:
            px = (np.array([lx, ly]) - np.array([x, y])) * self.ppm + half
            idx = _LIGHT_MASK.get(state, RED_LIGHTS) - RED_LIGHTS
            cv2.circle(light_masks[idx], tuple(np.round(px).astype(int)), r_px,
                       255, -1)

        masks = np.stack(
            [crop(self._road), crop(self._center), vehicles, ego, *light_masks],
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
        for idx in range(masks.shape[-1]):  # later layers draw on top
            rgb[masks[..., idx] > 0] = _PALETTE[idx]
        return rgb
