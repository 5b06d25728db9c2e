"""Full-stack agent test: opendrive -> native vectorizer -> RoughMap crop ->
route planner -> jitted MMFN inference -> PID -> control, in the fake world.

Uses a 1-layer fusion config to keep the CPU compile tractable; the point is
exercising every seam of the closed-loop path, not model quality.
"""


import jax
import numpy as np
import pytest

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.synthetic import synthetic_batch
from mmfn_tpu.harness.agents import MMFNAgent
from mmfn_tpu.harness.replay import ClosedLoopRunner
from mmfn_tpu.harness.route import RouteConfig
from tests.test_harness import STRAIGHT_XODR

@pytest.mark.parametrize("async_dispatch", [False, True],
                         ids=["sync", "async"])
def test_mmfn_agent_closed_loop_smoke(tool, tmp_path, async_dispatch):
    # vec only: the variants share the pipeline/agent machinery this test
    # exercises, and the full-stack rad path is covered by bench/demo runs.
    # async covers the pipelined one-tick-latency mode (docs/PARITY.md);
    # both parametrizations share the in-process jit cache.
    variant = "vec"
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, variant)
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    agent = MMFNAgent({
        "variant": variant, "model": model, "variables": variables,
        "config": cfg, "tmp_dir": str(tmp_path), "rmap_tool": tool,
        "points_per_sweep": 2048, "async_dispatch": async_dispatch,
    })
    # Warm the jit cache outside the closed loop's wall-clock budget (the CPU
    # compile of the full pipeline can exceed the runner's timeout).
    agent.pipeline(
        np.zeros((256, 256, 3), np.float32), np.zeros((8, 3), np.float32),
        np.zeros((cfg.max_lanes, 10, 5), np.float32), 1,
        np.zeros((81, 5), np.float32), None, np.zeros(2, np.float32), 0.0)

    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (60.0, 1.75, 0.0)], index=0)
    runner = ClosedLoopRunner(max_wall_seconds=300)
    record = runner.run_route(agent, config, STRAIGHT_XODR, max_ticks=6)

    # untrained net won't finish the route; the contract is: every tick produced
    # a control, the map pipeline loaded lanes, and PID metadata exists.
    assert agent.rough_map_loaded
    assert len(agent.rough_map.lanes) >= 1
    assert agent.step >= 4
    assert agent.pid_metadata, "model forward + PID never ran"
    assert record.status.startswith(("Failed", "Completed"))
    assert np.isfinite(record.scores["score_composed"])


@pytest.mark.slow
def test_pipeline_host_bev_matches_device_bev():
    """host_bev=True (ship the uint8 BEV count grid) must produce the same
    waypoints as shipping the padded f16 cloud for on-device binning. Points
    are pre-quantized to f16 so both paths bin bit-identical coordinates
    (host_bev otherwise bins at FULL precision — strictly closer to the
    reference's host binning, dataloader.py:271-293)."""
    from mmfn_tpu.harness.agents.pipeline import JitPipeline
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "vec")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    dev = JitPipeline(model, variables, cfg, points_per_sweep=2048)
    host = JitPipeline(model, variables, cfg, points_per_sweep=2048,
                       host_bev=True)

    rng = np.random.default_rng(7)
    points = rng.uniform(low=[-20, -30, -4], high=[20, 12, 2],
                         size=(3000, 3)).astype(np.float16).astype(np.float32)
    image = rng.integers(0, 256, size=(256, 256, 3)).astype(np.uint8)
    lanes = (rng.normal(size=(cfg.max_lanes, 10, 5)) * 10).astype(np.float32)
    radar = rng.normal(size=(81, 5)).astype(np.float32)
    tp = np.array([1.0, 4.0], np.float32)

    wp_dev = dev(image, points, lanes, 3, radar, None, tp, 2.0)
    wp_host = host(image, points, lanes, 3, radar, None, tp, 2.0)
    # rtol, not tight atol: the untrained net emits O(1e3) waypoints and the
    # two jit programs fuse differently (f32 reassociation ~ a few ulps)
    np.testing.assert_allclose(wp_host, wp_dev, rtol=1e-5, atol=1e-4)

    # fleet dispatch: a stacked batch of identical payloads must reproduce
    # the single-sample forward row-for-row
    payload = {"image": image, "points": points, "lanes": lanes, "lane_num": 3,
               "radar": radar, "map_img": None, "target_point": tp,
               "speed": 2.0}
    wp_fleet = np.asarray(dev.dispatch_fleet([payload, dict(payload)]))
    assert wp_fleet.shape[0] == 2
    np.testing.assert_allclose(wp_fleet[0], wp_dev, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(wp_fleet[1], wp_dev, rtol=1e-5, atol=1e-4)


def test_pack_columns_roundtrip_bit_exact():
    """_pack_columns -> device _unpack_columns is a bit-exact identity for
    every transport dtype the pipeline ships (u8 tensors, f16 clouds, f32
    features, i32 counts, per-row scalars) with None slots preserved."""
    from mmfn_tpu.harness.agents.pipeline import _pack_columns, _unpack_columns

    rng = np.random.default_rng(11)
    cols = [
        rng.integers(0, 256, size=(3, 4, 5, 2)).astype(np.uint8),
        rng.normal(size=(3, 7, 4)).astype(np.float16),
        None,
        (rng.normal(size=(3, 6)) * 1e3).astype(np.float32),
        rng.integers(-5, 99, size=(3,)).astype(np.int32),   # per-row scalar
        rng.normal(size=(3,)).astype(np.float32),
    ]
    bufs, spec = _pack_columns(cols)
    assert bufs.dtype == np.uint8 and bufs.shape[0] == 3
    assert spec[2] is None
    out = jax.jit(lambda b: _unpack_columns(b, spec))(bufs)
    assert out[2] is None
    for got, want in zip(out, cols):
        if want is None:
            continue
        got = np.asarray(got)
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_pipeline_packed_matches_unpacked():
    """packed=True (one uint8 buffer per tick, VERDICT r2 #3) must reproduce
    the per-array-transfer pipeline: same transport dtypes reach the same
    apply_batched, so only jit-fusion reassociation noise may differ."""
    from mmfn_tpu.harness.agents.pipeline import JitPipeline
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "vec")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    packed = JitPipeline(model, variables, cfg, points_per_sweep=2048)
    plain = JitPipeline(model, variables, cfg, points_per_sweep=2048,
                        packed=False)
    assert packed.packed and not plain.packed

    rng = np.random.default_rng(5)
    image = rng.integers(0, 256, size=(256, 256, 3)).astype(np.uint8)
    points = rng.uniform(low=[-20, -30, -4], high=[20, 12, 2],
                         size=(3000, 3)).astype(np.float32)
    lanes = (rng.normal(size=(cfg.max_lanes, 10, 5)) * 10).astype(np.float32)
    radar = rng.normal(size=(81, 5)).astype(np.float32)
    tp = np.array([1.0, 4.0], np.float32)

    wp_packed = packed(image, points, lanes, 3, radar, None, tp, 2.0)
    wp_plain = plain(image, points, lanes, 3, radar, None, tp, 2.0)
    np.testing.assert_allclose(wp_packed, wp_plain, rtol=1e-5, atol=1e-4)

    payload = {"image": image, "points": points, "lanes": lanes,
               "lane_num": 3, "radar": radar, "map_img": None,
               "target_point": tp, "speed": 2.0}
    fp = np.asarray(packed.dispatch_fleet([payload, dict(payload)]))
    fu = np.asarray(plain.dispatch_fleet([payload, dict(payload)]))
    np.testing.assert_allclose(fp, fu, rtol=1e-5, atol=1e-4)


def test_agent_auto_host_bev_threshold():
    """MMFNAgent auto-picks host_bev by transport size: the 131 KB uint8 BEV
    count grid beats the padded f16 cloud above 8192 points/sweep (the
    default 32768 ships 524 KB -> 131 KB per tick)."""
    from mmfn_tpu.harness.agents.pipeline import JitPipeline
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "vec")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    def make(**kw):
        a = MMFNAgent({"variant": "vec", "model": model,
                       "variables": variables, "config": cfg, **kw})
        hb = a.pipeline.host_bev
        a.destroy()
        return hb

    assert make() is True                               # default 32768 pts
    assert make(points_per_sweep=2048) is False         # small cloud: ship it
    assert make(host_bev=False) is False                # explicit wins
    assert make(points_per_sweep=2048, host_bev=True) is True


@pytest.mark.slow
def test_fleet_mesh_sharded_matches_unsharded():
    """dispatch_fleet over a 1-D device mesh (shard_map: params replicated,
    batch split on its leading axis, collective-free) must reproduce the
    unsharded batched forward row-for-row — both when the fleet width
    divides the mesh and when it does not (zero-row pad + slice-back)."""
    from jax.sharding import Mesh
    from mmfn_tpu.harness.agents.pipeline import JitPipeline
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "vec")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    plain = JitPipeline(model, variables, cfg, points_per_sweep=2048)
    mesh = Mesh(np.array(jax.devices()[:4]), ("fleet",))
    sharded = JitPipeline(model, variables, cfg, points_per_sweep=2048,
                          mesh=mesh)

    rng = np.random.default_rng(3)

    def payload():
        return {
            "image": rng.integers(0, 256, size=(256, 256, 3)).astype(np.uint8),
            "points": rng.uniform(low=[-20, -30, -4], high=[20, 12, 2],
                                  size=(3000, 3)).astype(np.float32),
            "lanes": (rng.normal(size=(cfg.max_lanes, 10, 5)) * 10
                      ).astype(np.float32),
            "lane_num": 3, "radar": rng.normal(size=(81, 5)).astype(np.float32),
            "map_img": None,
            "target_point": np.array([1.0, 4.0], np.float32), "speed": 2.0,
        }

    for width in (3, 4):     # 3 pads to the mesh size; 4 divides it exactly
        pls = [payload() for _ in range(width)]
        wp_plain = np.asarray(plain.dispatch_fleet(pls))
        wp_sharded = np.asarray(sharded.dispatch_fleet(pls))
        assert wp_sharded.shape == wp_plain.shape == (width,) + wp_plain.shape[1:]
        # rtol 2e-4: per-shard vs full-batch programs tile/reassociate f32
        # differently and the untrained net emits O(1e3) waypoints (observed
        # max rel diff ~5e-5 on CPU)
        np.testing.assert_allclose(wp_sharded, wp_plain, rtol=2e-4, atol=1e-2)


@pytest.mark.parametrize("pipelined", [False, True])
def test_fleet_runner_closed_loop(tool, tmp_path, pipelined):
    """Three routes in lockstep, one batched forward per tick; every route
    ends with a scored RouteRecord and every agent ran the model + PID.
    ``pipelined=True`` steers from the previous tick's batched forward while
    this tick's is in flight (one-tick actuation latency, docs/PARITY.md) —
    the scoring/record contract is identical."""
    from mmfn_tpu.harness.fleet import FleetRunner
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "vec")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    agents = [MMFNAgent({"variant": "vec", "model": model,
                         "variables": variables, "config": cfg,
                         "tmp_dir": str(tmp_path / "a0"), "rmap_tool": tool,
                         "points_per_sweep": 2048})]
    for k in (1, 2):
        agents.append(MMFNAgent({"variant": "vec",
                                 "pipeline": agents[0].pipeline,
                                 "config": cfg,
                                 "tmp_dir": str(tmp_path / f"a{k}"),
                                 "rmap_tool": tool}))

    routes = []
    for k in range(3):
        config = RouteConfig(route_id=str(k), town="TownTest",
                             trajectory=[(0.0, 1.75, 0.0), (60.0, 1.75, 0.0)],
                             index=k)
        routes.append({"config": config, "opendrive_str": STRAIGHT_XODR,
                       "max_ticks": 6})

    # instrument agent 0: finish_step must receive the PAYLOAD of the tick
    # whose forward produced the waypoints (finish_step's contract) — under
    # pipelining that is the previous tick's payload, same pairing as the
    # single-agent async_dispatch path.
    import itertools

    tags = []
    a0 = agents[0]
    orig_prepare, orig_finish = a0.prepare_step, a0.finish_step
    counter = itertools.count()

    def prepare(input_data):
        kind, payload = orig_prepare(input_data)
        if kind == "forward":
            payload["_tag"] = next(counter)
        return kind, payload

    def finish(payload, wps):
        tags.append(payload.get("_tag"))
        return orig_finish(payload, wps)

    a0.prepare_step, a0.finish_step = prepare, finish

    records = FleetRunner(max_wall_seconds=600,
                          pipelined=pipelined).run(agents, routes)

    assert len(tags) >= 3, "model forwards never reached finish_step"
    if pipelined:
        # the priming tick consumes its own forward; thereafter every
        # control is computed from the previous tick's (payload, waypoints)
        assert tags[:2] == [0, 0]
        assert tags[1:] == list(range(len(tags) - 1))
    else:
        assert tags == list(range(len(tags)))

    assert len(records) == 3
    for k, (agent, record) in enumerate(zip(agents, records)):
        assert record is not None, f"route {k} never finished"
        assert record.status.startswith(("Failed", "Completed"))
        assert np.isfinite(record.scores["score_composed"])
        assert agent.rough_map_loaded
        assert agent.pid_metadata, f"agent {k}: model forward + PID never ran"
