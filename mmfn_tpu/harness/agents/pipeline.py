"""Jitted batch-1 inference pipeline serving the closed loop.

One compiled XLA program per agent covering lidar BEV rasterization (Pallas),
radar adjacency, image normalization (inside the model), and the MMFN forward
— the host only crops the camera frame, fits the radar set, crops lanes, and
runs the scalar PID. Static shapes throughout: the two lidar sweeps are padded
to MAX_SWEEP_POINTS each, lanes to config.max_lanes.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.batch import Batch
from mmfn_tpu.ops.lidar import (HIST_MAX_PER_PIXEL, bev_counts_np,
                                lidar_to_histogram_features, pad_points)
from mmfn_tpu.ops.radar import radar_adjacency

MAX_SWEEP_POINTS = 32768  # one 64-ch sweep at 600k pts/s / 20 Hz, padded


def _pack_columns(cols):
    """Stacked transport arrays -> ONE uint8 buffer per row.

    ``cols``: per-input arrays of shape (N, ...) (or None). Returns
    ``(bufs, spec)`` where ``bufs`` is uint8 (N, total_bytes) — every row is
    the byte-concatenation of that sample's inputs — and ``spec`` is the
    hashable per-input ((row_shape, dtype_str) | None) layout key
    ``_unpack_columns`` inverts on device. Bit-exact by construction
    (raw byte views, no casts)."""
    spec = []
    parts = []
    n = next(c.shape[0] for c in cols if c is not None)
    for c in cols:
        if c is None:
            spec.append(None)
            continue
        c = np.ascontiguousarray(c)
        spec.append((c.shape[1:], c.dtype.str))
        parts.append(c.view(np.uint8).reshape(n, -1))
    return np.concatenate(parts, axis=1), tuple(spec)


def _unpack_columns(bufs, spec):
    """Inverse of :func:`_pack_columns`, traced on device: slice each input's
    byte range out of the (N, L) uint8 buffer and bitcast it back to its
    transport dtype/shape (free at the XLA level — bitcast + reshape)."""
    n = bufs.shape[0]
    out = []
    off = 0
    for item in spec:
        if item is None:
            out.append(None)
            continue
        shape, dstr = item
        dt = np.dtype(dstr)
        nbytes = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        seg = bufs[:, off:off + nbytes]
        if dt == np.uint8:
            arr = seg.reshape((n,) + shape)
        else:
            arr = jax.lax.bitcast_convert_type(
                seg.reshape(n, -1, dt.itemsize),
                jnp.dtype(dt)).reshape((n,) + shape)
        out.append(arr)
        off += nbytes
    return out


def shard_over_mesh(mesh, fn, n_batch_inputs: int, n_replicated: int = 1):
    """shard_map ``fn(replicated..., *batch_inputs)`` over the 1-D ``mesh``:
    the first ``n_replicated`` args replicate (P() prefix over the whole
    pytree — model variables, map tables); batch inputs split on their
    leading axis. None inputs are empty pytrees — their spec applies to zero
    leaves."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    specs = dict(mesh=mesh,
                 in_specs=(P(),) * n_replicated + (P(axis),) * n_batch_inputs,
                 out_specs=P(axis))
    try:
        from jax import shard_map              # jax >= 0.8
        return shard_map(fn, check_vma=False, **specs)
    except ImportError:                        # pragma: no cover
        # the pre-0.8 API spells the replication check 'check_rep'
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, check_rep=False, **specs)


def _pin_variables(variables, mesh=None):
    """Place model variables on device once, so per-tick jitted dispatches
    reuse resident buffers instead of re-uploading host (numpy) leaves —
    flax's ``from_bytes`` checkpoint restore returns numpy trees. With a
    serving mesh, replicate (the fleet ``shard_map`` takes params as P())."""
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(variables, NamedSharding(mesh, PartitionSpec()))
    return jax.device_put(variables)


class JitPipeline:
    """Wraps (model, variables) into a single jitted sensor->waypoints call.

    ``host_bev=True`` bins the lidar cloud to the 256x256x2 BEV count grid on
    the host (uint8, lossless — counts clip at 5) instead of shipping the
    padded point cloud for on-device Pallas binning. Same bin math either way
    (and the host path bins full-precision floats, like the reference's
    dataloader.py:271-293, vs the f16-shipped cloud); choose by link: ~3x
    fewer bytes/tick on a thin host<->device link, while a colocated host
    prefers the on-device kernel.

    ``packed=True`` (default) byte-concatenates every per-tick input into ONE
    uint8 host buffer and bitcasts it apart inside the jitted program: one
    host->device transfer per tick instead of eight. Bit-exact (raw byte
    views); measured 1.30x per tick through this environment's TPU relay
    (scripts/_packed_transfer_probe.py). ``packed=False`` restores per-array
    transfers.

    ``mesh`` (a 1-D ``jax.sharding.Mesh``) shards ``dispatch_fleet``'s batch
    across devices: params replicate, every batch input splits on its leading
    axis, and each chip runs the identical per-sample program on its shard —
    collective-free data-parallel SERVING (the reference has no analog; its
    evaluator is one GPU, one vehicle, leaderboard_evaluator.py:386-411).
    ``shard_map`` rather than GSPMD-annotated jit so the Pallas BEV kernel
    stays a per-device program (no custom-call partitioning needed). Batches
    not divisible by the mesh pad with zero rows (lane_num=1) and slice back.
    """

    def __init__(self, model, variables, config: GlobalConfig,
                 points_per_sweep: int = MAX_SWEEP_POINTS,
                 host_bev: bool = False, mesh=None, packed: bool = True):
        self.model = model
        # pin the params on device ONCE: checkpoint loads hand this numpy
        # leaves (flax from_bytes), and passing those to a jitted call
        # re-uploads every parameter every tick — measured ~4.5 s/tick for
        # the full MMFN-rad through the relay (round 4). Replicate over the
        # mesh when serving sharded (dispatch_fleet shard_map expects P()).
        self.variables = _pin_variables(variables, mesh)
        self.config = config
        self.variant = model.variant
        self.points_per_sweep = points_per_sweep
        self.host_bev = host_bev
        self.mesh = mesh
        # packed: ship each sample's inputs as ONE uint8 byte buffer and
        # bitcast them back inside the jitted program — one host->device
        # transfer per tick instead of eight. Bit-exact (raw byte views), so
        # on by default; measured 1.30x per-tick on this environment's relay
        # link (14.0 -> 10.8 ms at a 330 KB payload) and neutral-or-better on
        # a colocated host (fewer, larger copies).
        self.packed = packed
        self._packed_jit = {}        # spec -> jit(variables, bufs) -> out
        self._packed_fleet_jit = {}  # spec -> mesh-sharded variant

        def apply_batched(variables, image, points, lanes, lane_num, radar,
                          map_img, target_point, velocity):
            # All inputs carry a leading batch dim (1 for the single-agent
            # wrapper, N for a fleet). image arrives uint8 and points float16:
            # the host->device copy is the closed loop's bottleneck (4 MB/tick
            # at f32), and both casts are exact for their sources (camera
            # bytes; positions whose 0.25 m BEV bins dwarf f16's ~3 cm ulp at
            # range). In host_bev mode `points` is already the uint8 count
            # grid.
            if host_bev:
                bev = points.astype(jnp.float32) / HIST_MAX_PER_PIXEL
            else:
                points = points.astype(jnp.float32)
                bev = jax.vmap(lidar_to_histogram_features)(points)
            radar_adj = radar_adjacency(radar)
            batch = Batch(
                image=image.astype(jnp.float32),
                lidar_bev=bev,
                map_img=None if map_img is None else map_img.astype(jnp.float32),
                lanes=lanes,
                lane_num=lane_num,
                radar=radar,
                radar_adj=radar_adj,
                target_point=target_point,
                velocity=velocity,
            )
            return model.apply(variables, batch, False)

        @jax.jit
        def forward(variables, image, points, lanes, lane_num, radar,
                    map_img, target_point, velocity):
            def up(x):
                return None if x is None else x[None]

            return apply_batched(variables, up(image), up(points), up(lanes),
                                 up(lane_num), up(radar), up(map_img),
                                 up(target_point), up(velocity))[0]

        self._forward = forward
        self._apply_batched = apply_batched
        self._forward_batched = jax.jit(apply_batched)
        if mesh is None:
            self._forward_fleet = self._forward_batched
        else:
            self._forward_fleet = jax.jit(self._shard_over_mesh(
                apply_batched, n_batch_inputs=8))

    def _shard_over_mesh(self, fn, n_batch_inputs: int):
        return shard_over_mesh(self.mesh, fn, n_batch_inputs)

    def _packed_call(self, spec, fleet: bool = False):
        """The jitted (variables, uint8[N, L]) -> waypoints program for one
        packed layout ``spec`` (cached — layouts are stable within a run)."""
        cache = self._packed_fleet_jit if fleet else self._packed_jit
        fn = cache.get(spec)
        if fn is None:
            apply_batched = self._apply_batched

            def packed_apply(variables, bufs):
                return apply_batched(variables, *_unpack_columns(bufs, spec))

            if fleet and self.mesh is not None:
                fn = jax.jit(self._shard_over_mesh(packed_apply,
                                                   n_batch_inputs=1))
            else:
                fn = jax.jit(packed_apply)
            cache[spec] = fn
        return fn

    def dispatch(self, image: np.ndarray, points: np.ndarray,
                 lanes: Optional[np.ndarray], lane_num: Optional[int],
                 radar: np.ndarray, map_img: Optional[np.ndarray],
                 target_point: np.ndarray, velocity: float) -> jax.Array:
        """Enqueue one forward; returns the un-fetched device array.

        JAX dispatch is asynchronous — this returns as soon as the program is
        enqueued, letting a pipelined caller overlap the device round trip
        with the next tick's host work (fetch with ``np.asarray`` when the
        result is actually needed).

        Numpy arrays go straight into the jitted call (one transfer batch per
        dispatch — explicit per-array jnp.asarray costs a round-trip each on
        remote-device links). The camera ships as uint8 and the padded cloud
        as float16 (or, with host_bev, the uint8 BEV count grid); the device
        casts back (see ``forward``). With ``packed`` (default) the whole
        tick ships as ONE uint8 buffer, bitcast apart on device."""
        args = self._host_args(image, points, lanes, lane_num, radar, map_img,
                               target_point, velocity)
        if not self.packed:
            return self._forward(self.variables, *args)
        bufs, spec = _pack_columns(
            [None if a is None else np.asarray(a)[None] for a in args])
        return self._packed_call(spec)(self.variables, bufs)[0]

    def _host_args(self, image, points, lanes, lane_num, radar, map_img,
                   target_point, velocity):
        """Transport-dtype conversions for ONE sample (no batch dim)."""
        if self.host_bev:
            points4 = bev_counts_np(points)
        else:
            points4 = pad_points(points, 2 * self.points_per_sweep).astype(np.float16)
        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = image.astype(np.uint8)   # exact: raw 0-255 camera values
        lanes_arr = lane_num_arr = None
        if lanes is not None:
            lanes_arr = np.asarray(lanes, dtype=np.float32)
            lane_num_arr = np.asarray(lane_num, dtype=np.int32)
        return (
            image,
            points4,
            lanes_arr,
            lane_num_arr,
            np.asarray(radar, dtype=np.float32),
            None if map_img is None else
            np.asarray(map_img).astype(np.uint8),   # raster bytes, cast back on device
            np.asarray(target_point, dtype=np.float32),
            np.asarray(velocity, dtype=np.float32),
        )

    def dispatch_fleet(self, payloads) -> jax.Array:
        """One batched forward over N agents' ``prepare_step`` payloads
        (one compiled program per fleet size N; one transfer per tick for the
        whole fleet). Returns the un-fetched (N, pred_len, 2) device array.

        With a ``mesh``, the batch splits across the mesh's devices (padded
        to a multiple of the mesh size with zero rows; lane_num pads with 1
        because the masked lane attention expects >= 1 valid token)."""
        rows = [self._host_args(p["image"], p["points"], p["lanes"],
                                p["lane_num"], p["radar"], p["map_img"],
                                p["target_point"], p["speed"])
                for p in payloads]
        cols = list(zip(*rows))
        stacked = [None if col[0] is None else np.stack(col) for col in cols]
        n = len(payloads)
        pad = 0 if self.mesh is None else (-n) % self.mesh.size
        if pad:
            def padded(i, x):
                if x is None:
                    return None
                ext = np.zeros((pad,) + x.shape[1:], x.dtype)
                if i == 3:                       # lane_num rows
                    ext[:] = 1
                return np.concatenate([x, ext])

            stacked = [padded(i, x) for i, x in enumerate(stacked)]
        if self.packed:
            bufs, spec = _pack_columns(stacked)
            out = self._packed_call(spec, fleet=self.mesh is not None)(
                self.variables, bufs)
        elif self.mesh is None:
            out = self._forward_batched(self.variables, *stacked)
        else:
            out = self._forward_fleet(self.variables, *stacked)
        return out[:n] if pad else out

    def __call__(self, image: np.ndarray, points: np.ndarray,
                 lanes: Optional[np.ndarray], lane_num: Optional[int],
                 radar: np.ndarray, map_img: Optional[np.ndarray],
                 target_point: np.ndarray, velocity: float) -> np.ndarray:
        """Synchronous sensor->waypoints call (dispatch + blocking fetch)."""
        return np.asarray(self.dispatch(image, points, lanes, lane_num, radar,
                                        map_img, target_point, velocity))

    @functools.cached_property
    def zero_lanes(self) -> np.ndarray:
        cfg = self.config
        return np.zeros((cfg.max_lanes, cfg.lane_node_num, cfg.feature_num), np.float32)
