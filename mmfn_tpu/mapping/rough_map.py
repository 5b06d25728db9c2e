"""Vectorized-map (.rmap) reader and per-pose lane cropper.

The reference ships a closed-source C++ binary (assets/package/rough_map_node)
that converts OpenDRIVE XML into a ``.rmap`` text file, parsed by RoughMap
(team_code/expert_agent/common/utils.py:381-447). This module reads/writes the
same format and reimplements the per-pose crop in pure vectorized numpy (the
reference uses shapely polygon tests per lane).

.rmap format (recovered from the reference parser, utils.py:395-415):
    line 1: header (ignored)
    line 2: "lane_num <k>"  (the count is the SECOND token)
    per lane:
        "node_num <n>"
        8 floats: the lane's 4-point bounding polygon (4x2, row-major)
        node_num lines of feature_num=5 floats:
            [x, y, intersection, turn_dir, traffic_control]
            (feature semantics documented at model_vec.py:370-377)

The companion OpenDRIVE -> .rmap generator lives in native/rough_map_node.cpp
(our own C++ tool, built by scripts/build_native.sh).
"""

from __future__ import annotations

import math
import os
import subprocess
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class RoughLane:
    polygon: np.ndarray      # (4, 2) bounding polygon
    nodes: np.ndarray        # (node_num, feature_num) — the 5-feature contract
    widths: np.ndarray = None  # (node_num,) lane widths, meters (rmap v2) or None


def _convex_polys_intersect(poly: np.ndarray, polys: np.ndarray) -> np.ndarray:
    """SAT intersection test of one convex polygon against many.

    poly: (P, 2); polys: (L, Q, 2). Returns bool (L,) — True when NOT disjoint
    (touching counts as intersecting, matching shapely's ``disjoint``).
    """
    if polys.shape[0] == 0:
        return np.zeros((0,), dtype=bool)

    def edge_normals(pts: np.ndarray) -> np.ndarray:
        e = np.roll(pts, -1, axis=-2) - pts
        return np.stack([-e[..., 1], e[..., 0]], axis=-1)

    separated = np.zeros(polys.shape[0], dtype=bool)

    # axes from the single query polygon: (P, 2)
    for axis in edge_normals(poly):
        if not np.any(axis):
            continue
        a = poly @ axis                        # (P,)
        b = polys @ axis                       # (L, Q)
        separated |= (a.max() < b.min(axis=1)) | (b.max(axis=1) < a.min())

    # axes from each lane polygon: (L, Q, 2)
    normals = edge_normals(polys)
    for q in range(normals.shape[1]):
        axis = normals[:, q, :]                # (L, 2)
        a = poly @ axis.T                      # (P, L)
        b = np.einsum("lqc,lc->lq", polys, axis)  # (L, Q)
        degenerate = ~np.any(axis, axis=1)
        sep = (a.max(axis=0) < b.min(axis=1)) | (b.max(axis=1) < a.min(axis=0))
        separated |= sep & ~degenerate

    return ~separated


class RoughMap:
    """Reads a .rmap and crops lanes around an ego pose into model inputs."""

    def __init__(self, up: float = 28.0, down: float = 28.0, left: float = 28.0,
                 right: float = 28.0, lane_node_num: int = 10, feature_num: int = 5):
        # query box in ego frame; x forward (+up/-down), y lateral (-left/+right)
        self.base_polygon = np.array(
            [[up, -left], [-down, -left], [-down, right], [up, right]], dtype=np.float64)
        self.lane_node_num = lane_node_num
        self.feature_num = feature_num
        self.lanes: List[RoughLane] = []
        self._polys: Optional[np.ndarray] = None   # (L, 4, 2) stacked

    # ---- IO --------------------------------------------------------------- #

    def read(self, file_path: str) -> "RoughMap":
        with open(file_path) as f:
            f.readline()  # header
            lane_num = int(f.readline().strip().split(" ")[1])
            self.lanes = []
            for _ in range(lane_num):
                node_num = int(f.readline().strip().split(" ")[1])
                polygon = np.array(f.readline().strip().split(), dtype=np.float64).reshape(4, 2)
                nodes = np.array(
                    [f.readline().strip().split(" ") for _ in range(node_num)],
                    dtype=np.float64)
                # v2 files append a 6th per-node column (lane width); the
                # model-facing feature contract stays the reference's 5
                widths = None
                if nodes.ndim == 2 and nodes.shape[1] > 5:
                    widths = nodes[:, 5].copy()
                    nodes = nodes[:, :5]
                self.lanes.append(RoughLane(polygon, nodes, widths))
        self._polys = (np.stack([l.polygon for l in self.lanes])
                       if self.lanes else np.zeros((0, 4, 2)))
        return self

    # ---- crop ------------------------------------------------------------- #

    def process(self, pose2d: Sequence[float]) -> np.ndarray:
        """pose2d [x, y, theta] -> (num_lanes, lane_node_num, feature_num).

        Lanes whose bounding polygon intersects the ego query box are kept;
        nodes are expressed in the ego frame; short lanes are zero-padded.
        Returns an empty (0, ...) array when no lane is near (callers fall
        back to zeros(1, N, F) with a warning, reference base_agent.py:216-218).
        """
        x, y, theta = pose2d
        c, s = math.cos(theta), math.sin(theta)
        rot = np.array([[c, -s], [s, c]])
        query = self.base_polygon @ rot.T + np.array([x, y])

        keep = _convex_polys_intersect(query, self._polys)
        inv_rot = rot.T  # rotate by -theta
        out = []
        for idx in np.nonzero(keep)[0]:
            nodes = self.lanes[idx].nodes
            local_xy = (nodes[:, :2] - np.array([x, y])) @ inv_rot.T
            pts = np.concatenate([local_xy, nodes[:, 2:]], axis=1)
            if pts.shape[0] < self.lane_node_num:
                pad = np.zeros((self.lane_node_num - pts.shape[0], self.feature_num))
                pts = np.concatenate([pts, pad], axis=0)
            out.append(pts[: self.lane_node_num])
        if not out:
            return np.zeros((0, self.lane_node_num, self.feature_num))
        return np.stack(out)

    def process_padded(self, pose2d: Sequence[float],
                       max_lanes: int) -> Tuple[np.ndarray, int]:
        """Crop and pad to the static (max_lanes, N, F) model input."""
        lanes = self.process(pose2d)
        n = lanes.shape[0]
        if n == 0:
            # reference fallback: a single all-zero lane (mmfn_vectornet.py:179-181)
            return np.zeros((max_lanes, self.lane_node_num, self.feature_num),
                            dtype=np.float32), 1
        out = np.zeros((max_lanes, self.lane_node_num, self.feature_num), dtype=np.float32)
        n = min(n, max_lanes)
        out[:n] = lanes[:n]
        return out, n


# --------------------------------------------------------------------------- #
# Native-tool driver + writer
# --------------------------------------------------------------------------- #

def default_tool_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "build", "rough_map_node")


def build_rmap(dirs: Sequence[str], tool_path: Optional[str] = None) -> bool:
    """Run the OpenDRIVE vectorizer on each dir (expects <dir>/opstr.txt,
    writes <dir>/a.rmap). Returns True on error, like the reference
    (utils.py:348-367). The tool prints 'ok' on success."""
    tool = tool_path or default_tool_path()
    if not os.path.exists(tool):
        print(f"rough_map_node not found at {tool}; run scripts/build_native.sh")
        return True
    for d in dirs:
        proc = subprocess.run([tool, d], capture_output=True, text=True)
        if proc.returncode != 0 or not proc.stdout.rstrip().endswith("ok"):
            print(f"rough_map_node failed for {d}: {proc.stdout} {proc.stderr}")
            return True
    return False


def write_rmap(path: str, lanes: Sequence[Tuple[np.ndarray, np.ndarray]],
               header: str = "rmap v1") -> None:
    """Write lanes [(polygon (4,2), nodes (N,F)), ...] in the .rmap format."""
    with open(path, "w") as f:
        f.write(header + "\n")
        f.write(f"lane_num {len(lanes)}\n")
        for polygon, nodes in lanes:
            f.write(f"node_num {len(nodes)}\n")
            f.write(" ".join(f"{v:.6f}" for v in np.asarray(polygon).reshape(-1)) + "\n")
            for row in np.asarray(nodes):
                f.write(" ".join(f"{v:.6f}" for v in row) + "\n")


def vectorize_xodr(xodr: str, work_dir: Optional[str] = None,
                   tool_path: Optional[str] = None, birdview: bool = True):
    """OpenDRIVE string -> (RoughMap, BirdViewProducer-or-None, rmap_path).

    The one shared implementation of the write-opstr -> rough_map_node ->
    RoughMap.read (-> BirdViewProducer) sequence that phase0, the examples,
    and the agents each need. Raises RuntimeError when the native vectorizer
    fails — silent map loss must not silently disable signals/penalties.
    """
    import tempfile

    base = work_dir or tempfile.mkdtemp(prefix="mmfn_map_")
    map_dir = os.path.join(base, "opendrive")
    os.makedirs(map_dir, exist_ok=True)
    with open(os.path.join(map_dir, "opstr.txt"), "w") as f:
        f.write(xodr)
    if build_rmap([map_dir], tool_path=tool_path):
        raise RuntimeError(f"rough_map_node failed to vectorize the map "
                           f"(see {map_dir}); run ./scripts/build_native.sh?")
    rmap_path = os.path.join(map_dir, "a.rmap")
    rough_map = RoughMap().read(rmap_path)
    producer = None
    if birdview:
        from mmfn_tpu.mapping.birdview import BirdViewProducer

        producer = BirdViewProducer.from_opendrive(rmap_path)
    return rough_map, producer, rmap_path
