"""End-to-end benchmark: sensor -> waypoints frames/sec/chip.

The benched pipeline covers the full per-frame compute the reference performs
per simulator tick on the GPU+host (mmfn_vectornet.py:199-309 +
dataloader.py:271-346): LiDAR ego-registration + BEV rasterization (Pallas
one-hot-matmul kernel), radar adjacency, image normalization, and the full
MMFN forward to 4 waypoints. Everything runs on-device in one jitted program.

Reports ONE JSON line. ``vs_baseline`` is measured frames/sec divided by the
reference's closed-loop budget of 20 frames/sec (the CARLA 20 Hz synchronous
tick the reference model must serve, leaderboard_evaluator.py:61,203-205 —
the repo publishes no model-throughput numbers, BASELINE.md).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.batch import Batch
from mmfn_tpu.models import build_model
from mmfn_tpu.ops.lidar import lidar_to_histogram_features, transform_2d_points
from mmfn_tpu.ops.radar import radar_adjacency

MAX_POINTS = 65536  # two 64-ch sweeps at 600k pts/s / 20 Hz, padded
BATCH = 8
WARMUP = 5
ITERS = 30


def make_inputs(batch, rng):
    return dict(
        image=jnp.asarray(rng.integers(0, 256, size=(batch, 256, 256, 3)).astype(np.float32)),
        points=jnp.asarray(rng.uniform(-30, 30, size=(batch, MAX_POINTS, 4)).astype(np.float32)),
        pose=jnp.asarray(rng.normal(size=(batch, 6)).astype(np.float32)),  # r1,t1x,t1y,r2,t2x,t2y
        lanes=jnp.asarray(rng.normal(size=(batch, 64, 10, 5)).astype(np.float32) * 10),
        lane_num=jnp.asarray(rng.integers(1, 64, size=(batch,)), dtype=jnp.int32),
        radar=jnp.asarray(rng.normal(size=(batch, 81, 5)).astype(np.float32)),
        target_point=jnp.asarray(rng.normal(size=(batch, 2)).astype(np.float32) * 5),
        velocity=jnp.asarray(np.abs(rng.normal(size=(batch,))).astype(np.float32) * 5),
    )


def build_pipeline(cfg, model):
    def pipeline(variables, inp):
        # --- on-device sensor preprocessing ---
        def per_cloud(points, pose):
            pts = transform_2d_points(points[:, :3], pose[0], pose[1], pose[2],
                                      pose[3], pose[4], pose[5])
            pts4 = jnp.concatenate([pts, points[:, 3:4]], axis=1)
            return lidar_to_histogram_features(pts4)

        bev = jax.vmap(per_cloud)(inp["points"], inp["pose"])
        adj = radar_adjacency(inp["radar"])
        batch = Batch(
            image=inp["image"], lidar_bev=bev,
            lanes=inp["lanes"], lane_num=inp["lane_num"],
            radar=inp["radar"], radar_adj=adj,
            target_point=inp["target_point"], velocity=inp["velocity"],
        )
        return model.apply(variables, batch, False)

    return jax.jit(pipeline)


def timed(fn, variables, inputs, iters):
    jax.block_until_ready(fn(variables, inputs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, inputs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    cfg = GlobalConfig()
    model = build_model(cfg, "rad")

    init_inp = make_inputs(1, rng)
    init_batch = Batch(
        image=init_inp["image"], lidar_bev=jnp.zeros((1, 256, 256, 2)),
        lanes=init_inp["lanes"], lane_num=init_inp["lane_num"],
        radar=init_inp["radar"], radar_adj=radar_adjacency(init_inp["radar"]),
        target_point=init_inp["target_point"], velocity=init_inp["velocity"],
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        init_batch, False)

    pipeline = build_pipeline(cfg, model)

    # batch-1 closed-loop latency
    inputs1 = make_inputs(1, rng)
    for _ in range(WARMUP):
        jax.block_until_ready(pipeline(variables, inputs1))
    latency_s = timed(pipeline, variables, inputs1, ITERS)

    # throughput at a serving batch
    inputs_b = make_inputs(BATCH, rng)
    for _ in range(WARMUP):
        jax.block_until_ready(pipeline(variables, inputs_b))
    batch_s = timed(pipeline, variables, inputs_b, ITERS)
    fps = BATCH / batch_s

    print(json.dumps({
        "metric": "end-to-end frames/sec/chip (sensor->waypoints, full MMFN-rad)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 2),
        "batch": BATCH,
        "batch1_latency_ms": round(latency_s * 1e3, 2),
        "batch1_fps": round(1.0 / latency_s, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
