"""LiDAR preprocessing: ego-frame re-registration + BEV histogram rasterization.

Reference semantics (team_code/mmfn_utils/datasets/dataloader.py:271-334):

- ``transform_2d_points``: rigid SE(2) re-registration of a point cloud from a
  capture pose into the current ego pose (z is carried through untouched).
- ``lidar_to_histogram_features``: two-height-slice (z <= -2 m / z > -2 m)
  occupancy histogram on a 256x256 grid at 8 px/m, x in [-16, 16],
  y in [-24, 8], clipped at 5 points/cell and normalized to [0, 1].

TPU design: a scatter-add over 65k cells is VPU/serial-hostile; instead the
histogram is computed as a one-hot matmul H = A^T B on the MXU, where
A[n, i] = 1 iff point n falls in x-bin i and B[n, j] stacks the y-bin one-hots
for the two height slices. The Pallas kernel streams point chunks through VMEM
so the (N x 256) one-hots never touch HBM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Grid constants (fixed by the reference's sensor geometry).
PIXELS_PER_METER = 8
HIST_MAX_PER_PIXEL = 5.0
X_RANGE = (-16.0, 16.0)
Y_RANGE = (-24.0, 8.0)
GRID = 256
HEIGHT_SPLIT = -2.0  # z <= -2 -> "below" channel 0, else "above" channel 1

_CHUNK = 4096  # points per Pallas grid step


# --------------------------------------------------------------------------- #
# SE(2) re-registration
# --------------------------------------------------------------------------- #

def transform_2d_points_np(xyz: np.ndarray, r1: float, t1_x: float, t1_y: float,
                           r2: float, t2_x: float, t2_y: float) -> np.ndarray:
    """Numpy oracle: map points from pose-1 frame to pose-2 frame.

    Pose convention matches the reference: the frame-to-world transform is
    ``[[cos r, sin r, tx], [-sin r, cos r, ty]]`` applied to [x, y, 1].
    """
    out = np.array(xyz, dtype=np.float64, copy=True)
    c1, s1 = np.cos(r1), np.sin(r1)
    c2, s2 = np.cos(r2), np.sin(r2)
    x, y = xyz[:, 0], xyz[:, 1]
    wx = c1 * x + s1 * y + t1_x
    wy = -s1 * x + c1 * y + t1_y
    # inverse of the pose-2 frame-to-world transform
    dx, dy = wx - t2_x, wy - t2_y
    out[:, 0] = c2 * dx - s2 * dy
    out[:, 1] = s2 * dx + c2 * dy
    return out


def transform_2d_points(xyz: jnp.ndarray, r1, t1_x, t1_y, r2, t2_x, t2_y) -> jnp.ndarray:
    """JAX version of :func:`transform_2d_points_np` (static shape, jittable)."""
    c1, s1 = jnp.cos(r1), jnp.sin(r1)
    c2, s2 = jnp.cos(r2), jnp.sin(r2)
    x, y = xyz[:, 0], xyz[:, 1]
    wx = c1 * x + s1 * y + t1_x
    wy = -s1 * x + c1 * y + t1_y
    dx, dy = wx - t2_x, wy - t2_y
    nx = c2 * dx - s2 * dy
    ny = s2 * dx + c2 * dy
    return jnp.stack([nx, ny] + [xyz[:, k] for k in range(2, xyz.shape[1])], axis=1)


# --------------------------------------------------------------------------- #
# BEV histogram — numpy oracle
# --------------------------------------------------------------------------- #

def lidar_to_histogram_features_np(lidar: np.ndarray) -> np.ndarray:
    """Numpy oracle. Input (N, >=3) points; output (256, 256, 2) float32 NHWC
    (the reference returns (2, 256, 256) CHW; channel 0 = below, 1 = above;
    spatial layout is [x-bin, y-bin] in both)."""
    nx = int((X_RANGE[1] - X_RANGE[0]) * PIXELS_PER_METER)
    xbins = np.linspace(X_RANGE[0], X_RANGE[1], nx + 1)
    ybins = np.linspace(Y_RANGE[0], Y_RANGE[1], nx + 1)

    def splat(points: np.ndarray) -> np.ndarray:
        hist = np.histogramdd(points[..., :2], bins=(xbins, ybins))[0]
        hist[hist > HIST_MAX_PER_PIXEL] = HIST_MAX_PER_PIXEL
        return hist / HIST_MAX_PER_PIXEL

    below = lidar[lidar[..., 2] <= HEIGHT_SPLIT]
    above = lidar[lidar[..., 2] > HEIGHT_SPLIT]
    return np.stack([splat(below), splat(above)], axis=-1).astype(np.float32)


# --------------------------------------------------------------------------- #
# BEV histogram — Pallas kernel (one-hot matmul on the MXU)
# --------------------------------------------------------------------------- #

def _bin_indices(x, y):
    """Map coordinates to bin indices with numpy-histogram edge semantics
    (half-open bins, right edge of the last bin inclusive)."""
    ix = jnp.floor((x - X_RANGE[0]) * PIXELS_PER_METER).astype(jnp.int32)
    iy = jnp.floor((y - Y_RANGE[0]) * PIXELS_PER_METER).astype(jnp.int32)
    ix = jnp.where(x == X_RANGE[1], GRID - 1, ix)
    iy = jnp.where(y == Y_RANGE[1], GRID - 1, iy)
    in_range = (x >= X_RANGE[0]) & (x <= X_RANGE[1]) & (y >= Y_RANGE[0]) & (y <= Y_RANGE[1])
    return ix, iy, in_range


def _bev_hist_kernel(pts_ref, out_ref, acc_ref):
    """Tuning notes (measured on v5e, batch 8 x 65536 points):
    - points arrive TRANSPOSED (4, CHUNK): a (N, 4) block wastes 128-lane
      tiles on the 4-wide trailing dim and measured 2x slower;
    - validity is folded into ix (-1 never matches any column) and the height
      slice into iy (+GRID for the "above" half), so each matmul operand is
      one compare with no masks/concats;
    - int8 one-hots with an int32 accumulator ride the MXU's double-rate
      int8 path (counts per chunk < 2^31, exact).
    Bin math stays f32 regardless of input dtype (bf16 lacks 1/8 m precision).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pts = pts_ref[:].astype(jnp.float32)           # (4, CHUNK): x, y, z, valid
    x, y, z, valid = pts[0], pts[1], pts[2], pts[3]
    ix, iy, in_range = _bin_indices(x, y)
    ok = in_range & (valid > 0.0)
    ix = jnp.where(ok, ix, -1)
    iy = iy + jnp.where(z <= HEIGHT_SPLIT, 0, GRID)

    cols_a = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, GRID), 1)
    cols_b = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 2 * GRID), 1)
    a = (cols_a == ix[:, None]).astype(jnp.int8)                  # (C, 256)
    b = (cols_b == iy[:, None]).astype(jnp.int8)                  # (C, 512)
    acc_ref[:] += jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = jnp.minimum(acc_ref[:].astype(jnp.float32),
                                 HIST_MAX_PER_PIXEL) / HIST_MAX_PER_PIXEL


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bev_hist_pallas(points4: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    n = points4.shape[0]
    if n % _CHUNK:
        # pad to a whole number of chunks with invalid rows (valid column 0)
        # — without this the grid would silently drop the tail, and n < CHUNK
        # would launch a zero-step grid that never writes the output
        pad = _CHUNK - n % _CHUNK
        points4 = jnp.concatenate(
            [points4, jnp.zeros((pad, 4), points4.dtype)], axis=0)
        n = points4.shape[0]
    num_chunks = n // _CHUNK
    points4_t = points4.T  # (4, N): lane-dim friendly layout, see kernel notes
    out = pl.pallas_call(
        _bev_hist_kernel,
        grid=(num_chunks,),
        in_specs=[pl.BlockSpec((4, _CHUNK), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((GRID, 2 * GRID), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID, 2 * GRID), jnp.float32),
        scratch_shapes=[pltpu.VMEM((GRID, 2 * GRID), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * GRID * 2 * GRID,
            bytes_accessed=n * 16 + GRID * 2 * GRID * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(points4_t)
    return jnp.stack([out[:, :GRID], out[:, GRID:]], axis=-1)


def _bev_hist_xla(points4: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA fallback (same one-hot-matmul formulation, unchunked)."""
    points4 = points4.astype(jnp.float32)
    x, y, z, valid = points4[:, 0], points4[:, 1], points4[:, 2], points4[:, 3]
    ix, iy, in_range = _bin_indices(x, y)
    ok = in_range & (valid > 0.0)
    below = z <= HEIGHT_SPLIT
    n = points4.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, GRID), 1)
    a = ((cols == ix[:, None]) & ok[:, None]).astype(jnp.float32)
    ymatch = (cols == iy[:, None]) & ok[:, None]
    b = jnp.concatenate(
        [(ymatch & below[:, None]).astype(jnp.float32),
         (ymatch & ~below[:, None]).astype(jnp.float32)], axis=1)
    hist = jax.lax.dot_general(a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    hist = jnp.minimum(hist, HIST_MAX_PER_PIXEL) / HIST_MAX_PER_PIXEL
    return jnp.stack([hist[:, :GRID], hist[:, GRID:]], axis=-1)


def bev_counts_np(points: np.ndarray) -> np.ndarray:
    """Host-side BEV binning: (N, >=3) ragged cloud -> (256, 256, 2) uint8
    per-cell counts clipped at HIST_MAX_PER_PIXEL.

    Same bin semantics as :func:`lidar_to_histogram_features_np` (dividing by
    HIST_MAX_PER_PIXEL reproduces it exactly — counts are small integers, so
    uint8 transport is lossless). Used by the closed-loop pipeline's
    ``host_bev`` mode: on a thin host<->device link, shipping the 131 KB count
    grid beats shipping the padded point cloud (the reference also bins on
    host, dataloader.py:271-293); a vectorized bincount over one CARLA
    two-sweep cloud (~60k points) costs <1 ms.
    """
    pts = np.asarray(points)
    x, y, z = (pts[:, 0].astype(np.float64), pts[:, 1].astype(np.float64),
               pts[:, 2])
    ix = np.floor((x - X_RANGE[0]) * PIXELS_PER_METER).astype(np.int64)
    iy = np.floor((y - Y_RANGE[0]) * PIXELS_PER_METER).astype(np.int64)
    ix[x == X_RANGE[1]] = GRID - 1
    iy[y == Y_RANGE[1]] = GRID - 1
    ok = ((x >= X_RANGE[0]) & (x <= X_RANGE[1])
          & (y >= Y_RANGE[0]) & (y <= Y_RANGE[1]))
    above = (z > HEIGHT_SPLIT).astype(np.int64)
    idx = (above * GRID * GRID + ix * GRID + iy)[ok]
    counts = np.bincount(idx, minlength=2 * GRID * GRID).reshape(2, GRID, GRID)
    return np.minimum(counts, int(HIST_MAX_PER_PIXEL)).astype(
        np.uint8).transpose(1, 2, 0)


def pad_points(points: np.ndarray, max_points: int) -> np.ndarray:
    """Host helper: (N, >=3) ragged cloud -> (max_points, 4) [x, y, z, valid]."""
    out = np.zeros((max_points, 4), dtype=np.float32)
    n = min(points.shape[0], max_points)
    out[:n, :3] = points[:n, :3]
    out[:n, 3] = 1.0
    return out


def lidar_to_histogram_features(points4: jnp.ndarray, *, use_pallas: bool | None = None) -> jnp.ndarray:
    """(max_points, 4) [x, y, z, valid] -> (256, 256, 2) BEV occupancy, NHWC.

    ``use_pallas=None`` auto-selects: the Pallas kernel on TPU backends (any
    point count — ragged tails are padded with invalid rows), pure XLA
    elsewhere.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _bev_hist_pallas(points4)
    return _bev_hist_xla(points4)
