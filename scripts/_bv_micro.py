"""Micro-bench of synth_birdview on silicon: per-piece cost per vehicle.
fori_loop-chained (bench.py methodology)."""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _require_device
_require_device()

import numpy as np
import jax, jax.numpy as jnp
from mmfn_tpu.mapping.birdview import BirdViewProducer
from mmfn_tpu.mapping.rough_map import RoughMap, build_rmap
from mmfn_tpu.harness import device_world as dw
import tempfile

XODR = open("data/maps/fake_town_cross.xodr").read()
d = tempfile.mkdtemp(); md = os.path.join(d, "opendrive"); os.makedirs(md)
open(os.path.join(md, "opstr.txt"), "w").write(XODR)
assert not build_rmap([md])
rmap = RoughMap().read(os.path.join(md, "a.rmap"))
producer = BirdViewProducer(rmap)
tables = {k: jnp.asarray(v) for k, v in dw.raster_tables(producer).items()}
print("canvas", tables["bv_canvas"].shape, flush=True)

B = 32
rng = np.random.default_rng(0)
pose = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32) * 5)
actors = jnp.asarray(rng.normal(size=(B, 8, 9)).astype(np.float32))
lights = jnp.asarray(np.zeros((B, 8, 4), np.float32))

ppm, tgt, crop = producer.ppm, producer.target_size, producer.crop_size


def timed(fn, *args, iters=30):
    @jax.jit
    def looped(*a):
        def body(i, acc):
            out = fn(a[0].at[:, 0].add(i * 1e-6), *a[1:])
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))
    _ = float(looped(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(looped(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters / B * 1e3   # ms per vehicle


def full(pose, actors, lights):
    return jax.vmap(lambda p, a, l: dw.synth_birdview(p, a, l, tables, ppm, tgt, crop))(pose, actors, lights)


def static_only(pose, actors, lights):
    def one(p, a, l):
        x, y, theta = p[0], p[1], p[2]
        half = crop // 2
        off = (crop - tgt) // 2
        canvas = tables["bv_canvas"]; min_xy = tables["bv_min_xy"]
        ii, jj = jnp.meshgrid(jnp.arange(tgt, dtype=jnp.float32), jnp.arange(tgt, dtype=jnp.float32), indexing="ij")
        ang = theta + jnp.pi / 2
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        dx = jj + off - half; dy = ii + off - half
        sx = ca * dx - sa * dy + half; sy = sa * dx + ca * dy + half
        cx = jnp.round((x - min_xy[0]) * ppm).astype(jnp.int32)
        cy = jnp.round((y - min_xy[1]) * ppm).astype(jnp.int32)
        cr = jax.lax.dynamic_slice(canvas, (cy - half, cx - half, 0), (crop, crop, 3))
        u0, v0 = jnp.floor(sx), jnp.floor(sy)
        fu, fv = sx - u0, sy - v0
        def tap(vi, ui, w):
            ok = (vi >= 0) & (vi < crop) & (ui >= 0) & (ui < crop) & (w > 0)
            val = cr[jnp.clip(vi, 0, crop - 1).astype(jnp.int32), jnp.clip(ui, 0, crop - 1).astype(jnp.int32)]
            return val.astype(jnp.float32) * (w * ok)[..., None]
        st = (tap(v0, u0, (1-fu)*(1-fv)) + tap(v0, u0+1, fu*(1-fv)) + tap(v0+1, u0, (1-fu)*fv) + tap(v0+1, u0+1, fu*fv))
        return st
    return jax.vmap(one)(pose, actors, lights)


def slice_only(pose, actors, lights):
    def one(p, a, l):
        x, y = p[0], p[1]
        half = crop // 2
        canvas = tables["bv_canvas"]; min_xy = tables["bv_min_xy"]
        cx = jnp.round((x - min_xy[0]) * ppm).astype(jnp.int32)
        cy = jnp.round((y - min_xy[1]) * ppm).astype(jnp.int32)
        cr = jax.lax.dynamic_slice(canvas, (cy - half, cx - half, 0), (crop, crop, 3))
        return cr.astype(jnp.float32)
    return jax.vmap(one)(pose, actors, lights)


def nearest_static(pose, actors, lights):
    def one(p, a, l):
        x, y, theta = p[0], p[1], p[2]
        half = crop // 2
        off = (crop - tgt) // 2
        canvas = tables["bv_canvas"]; min_xy = tables["bv_min_xy"]
        ii, jj = jnp.meshgrid(jnp.arange(tgt, dtype=jnp.float32), jnp.arange(tgt, dtype=jnp.float32), indexing="ij")
        ang = theta + jnp.pi / 2
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        dx = jj + off - half; dy = ii + off - half
        sx = ca * dx - sa * dy + half; sy = sa * dx + ca * dy + half
        cx = jnp.round((x - min_xy[0]) * ppm).astype(jnp.int32)
        cy = jnp.round((y - min_xy[1]) * ppm).astype(jnp.int32)
        cr = jax.lax.dynamic_slice(canvas, (cy - half, cx - half, 0), (crop, crop, 3))
        vi = jnp.clip(jnp.round(sy), 0, crop - 1).astype(jnp.int32)
        ui = jnp.clip(jnp.round(sx), 0, crop - 1).astype(jnp.int32)
        return cr[vi, ui].astype(jnp.float32)
    return jax.vmap(one)(pose, actors, lights)


def boxes_only(pose, actors, lights):
    def one(p, a, l):
        x, y, theta = p[0], p[1], p[2]
        half = crop // 2
        off = (crop - tgt) // 2
        ii, jj = jnp.meshgrid(jnp.arange(tgt, dtype=jnp.float32), jnp.arange(tgt, dtype=jnp.float32), indexing="ij")
        ang = theta + jnp.pi / 2
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        dx = jj + off - half; dy = ii + off - half
        sx = ca * dx - sa * dy + half; sy = sa * dx + ca * dy + half
        wx = (sx - half) / ppm; wy = (sy - half) / ppm
        ox = wx[..., None] - a[None, None, :, 0]
        oy = wy[..., None] - a[None, None, :, 1]
        cb, sb = jnp.cos(a[:, 6]), jnp.sin(a[:, 6])
        fwd = ox * cb + oy * sb
        side = -ox * sb + oy * cb
        L = 2 * a[:, 4]; W = 1.4 * a[:, 4]
        inside = (jnp.abs(fwd) <= L/2) & (jnp.abs(side) <= W/2) & (a[:, 8] > 0)
        return inside.any(-1).astype(jnp.float32)
    return jax.vmap(one)(pose, actors, lights)


for name, fn in [("full", full), ("static_bilinear", static_only),
                 ("static_nearest", nearest_static),
                 ("slice_only", slice_only), ("boxes", boxes_only)]:
    print(json.dumps({"piece": name, "ms_per_vehicle": round(timed(fn, pose, actors, lights), 3)}), flush=True)
