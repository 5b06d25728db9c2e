"""Device-side fake-world synthesis (harness/device_world.py).

Unit parity vs the numpy oracles (lane crop, radar fit), synthesis sanity,
and the closed-loop fleet in compact-world mode (sensors synthesized inside
the jitted forward; host ships ~260 B/vehicle/tick). VERDICT r3 next #2.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.harness.device_world import (
    ACTOR_SLAB, DeviceWorldPipeline, actor_slab_np, crop_lanes, map_tables,
    radar_fit, synth_camera, synth_lidar_points, synth_radar)
from mmfn_tpu.harness.route import RouteConfig
from mmfn_tpu.mapping.rough_map import RoughMap, build_rmap
from mmfn_tpu.ops.radar import radar_to_size_np

from tests.test_harness import STRAIGHT_XODR

CURVED_XODR = """<?xml version="1.0" standalone="yes"?>
<OpenDRIVE>
  <header revMajor="1" revMinor="4" name="bendy"/>
  <road name="R0" length="300.0" id="0" junction="-1">
    <planView>
      <geometry s="0.0" x="0.0" y="0.0" hdg="0.0" length="100.0"><line/></geometry>
      <geometry s="100.0" x="100.0" y="0.0" hdg="0.0" length="100.0">
        <arc curvature="0.005"/>
      </geometry>
      <geometry s="200.0" x="198.96" y="24.74" hdg="0.5" length="100.0"><line/></geometry>
    </planView>
    <lanes>
      <laneSection s="0.0">
        <left>
          <lane id="1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </left>
        <center><lane id="0" type="none" level="false"/></center>
        <right>
          <lane id="-1" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
          <lane id="-2" type="driving" level="false">
            <width sOffset="0.0" a="3.5" b="0.0" c="0.0" d="0.0"/>
          </lane>
        </right>
      </laneSection>
    </lanes>
  </road>
</OpenDRIVE>
"""


@pytest.fixture(scope="module")
def curved_map(tool, tmp_path_factory):
    d = tmp_path_factory.mktemp("dwmap")
    map_dir = d / "opendrive"
    map_dir.mkdir()
    (map_dir / "opstr.txt").write_text(CURVED_XODR)
    assert not build_rmap([str(map_dir)], tool_path=tool)
    return RoughMap().read(str(map_dir / "a.rmap"))


def test_crop_lanes_matches_numpy_cropper(curved_map):
    """Device SAT crop == RoughMap.process_padded (lanes, order, lane_num,
    empty-crop fallback) at poses across the map."""
    tables = {k: jnp.asarray(v) for k, v in map_tables(curved_map).items()}
    fn = jax.jit(lambda p: crop_lanes(p, tables, 16))
    poses = [
        (10.0, 1.75, 0.0), (10.0, -1.75, 0.1), (120.0, 3.0, 0.2),
        (250.0, 30.0, 0.5), (150.0, 2.0, -0.4), (40.0, 0.0, 3.0),
        (5000.0, 5000.0, 0.0),   # far away: zero lanes, lane_num 1
    ]
    for pose in poses:
        want, want_n = curved_map.process_padded(list(pose), 16)
        got, got_n = fn(jnp.asarray(pose, jnp.float32))
        assert int(got_n) == want_n, pose
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=5e-4, err_msg=str(pose))


def test_radar_fit_matches_numpy(rng):
    """radar_fit == radar_to_size_np over ragged valid prefixes, both in the
    over-full (delete largest |v/d|) and under-full (zero-pad) regimes."""
    for n_valid in (5, 40, 81, 96, 120):
        rows = rng.normal(size=(128, 5)).astype(np.float32)
        rows[:, 3] = rng.uniform(1.0, 90.0, 128)      # depths > 0
        rows[:, 0] = rng.normal(size=128) * 3         # distinct |v/d| keys
        valid = np.zeros(128, np.float32)
        valid[:n_valid] = 1.0
        want = radar_to_size_np(rows[:n_valid], (81, 5))
        got = np.asarray(jax.jit(radar_fit)(jnp.asarray(rows),
                                            jnp.asarray(valid)))
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"n_valid={n_valid}")


def test_synth_sensor_shapes_and_stats():
    """Synthesized sensors respect the host world's ranges: camera in
    [0, 255), BEV occupancy present, actor lidar returns cluster near the
    actor, radar rows carry the front/rear tag column."""
    key = jax.random.PRNGKey(0)
    img = np.asarray(synth_camera(key, 1.0))
    assert img.shape == (256, 256, 3)
    assert img.min() >= 0 and img.max() <= 254

    dim = np.asarray(synth_camera(key, 0.25))
    assert dim.max() <= 64

    actors = np.zeros((ACTOR_SLAB, 6), np.float32)
    actors[0] = [10.0, 0.0, 0.0, 0.0, 1.5, 2.0]      # 10 m ahead
    avalid = np.zeros(ACTOR_SLAB, np.float32)
    avalid[0] = 1.0
    pts = np.asarray(synth_lidar_points(key, jnp.asarray(actors),
                                        jnp.asarray(avalid), 0.0, 0.0))
    valid = pts[pts[:, 3] > 0]
    assert valid.shape[0] > 2 * 1200                 # ground + actor returns
    body = valid[valid[:, 2] > -2.0]                 # above the ground band
    assert body.shape[0] > 0
    # actor at (lat 0, fwd 10) -> post-flip (x ~ 0, y ~ -10)
    assert abs(np.median(body[:, 0])) < 2.5
    assert abs(np.median(body[:, 1]) + 10.0) < 2.5

    radar = np.asarray(synth_radar(key, jnp.asarray(actors),
                                   jnp.asarray(avalid), 0.0,
                                   jnp.zeros(2), 0.0))
    assert radar.shape == (81, 5)
    nz = radar[np.abs(radar).sum(axis=1) > 0]
    assert set(np.unique(nz[:, 4])) <= {0.0, 1.0}    # tag column
    assert (nz[:, 3] >= 0).all()                     # depths


def test_actor_slab_orders_by_distance():
    class A:
        def __init__(self, i, pos):
            self.actor_id = i
            self.position = np.asarray(pos, float)
            self.velocity = np.array([1.0, 0.0])
            self.extent = 1.5
            self.visible_sensors = i != 99

    actors = [A(1, (50, 0)), A(2, (5, 0)), A(3, (20, 0)), A(99, (1, 0))]
    slab, valid = actor_slab_np(actors, np.zeros(2), slab=3)
    # nearest first; the sensor-invisible actor rides the slab for the
    # birdview rasterizer but carries sensor-validity 0 (the lidar/radar
    # synthesizers mask it out)
    assert valid.tolist() == [0.0, 1.0, 1.0]
    np.testing.assert_allclose(slab[:, 0], [1.0, 5.0, 20.0])
    assert slab.shape == (3, 9)
    assert slab[:, 8].tolist() == [1.0, 1.0, 1.0]    # vis_graphics column


@pytest.mark.slow
def test_device_world_fleet_closed_loop(tool, tmp_path):
    """Two-vehicle fleet in compact-world mode: the world ships only state,
    sensors are synthesized inside the jitted forward, routes complete and
    score exactly like the host-world fleet path."""
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.harness.agents import MMFNAgent
    from mmfn_tpu.harness.fleet import FleetRunner
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    agents = [MMFNAgent({"variant": "rad", "model": model,
                         "variables": variables, "config": cfg,
                         "device_world": True,
                         "tmp_dir": str(tmp_path / "a0"), "rmap_tool": tool})]
    agents.append(MMFNAgent({"variant": "rad", "pipeline": agents[0].pipeline,
                             "config": cfg, "tmp_dir": str(tmp_path / "a1"),
                             "rmap_tool": tool}))
    routes = [{"config": RouteConfig(
                   route_id=str(k), town="TownTest",
                   trajectory=[(0.0, 1.75, 0.0), (60.0, 1.75, 0.0)], index=k),
               "opendrive_str": STRAIGHT_XODR, "max_ticks": 8,
               "world_kwargs": {"compact_sensors": True}}
              for k in range(2)]
    records = FleetRunner(max_wall_seconds=600,
                          pipelined=True).run(agents, routes)
    assert len(records) == 2
    for k, (agent, record) in enumerate(zip(agents, records)):
        assert record is not None, f"route {k} never finished"
        assert record.status.startswith(("Failed", "Completed"))
        assert np.isfinite(record.scores["score_composed"])
        assert agent.rough_map_loaded
        assert agent.pid_metadata, f"agent {k}: forward + PID never ran"


def test_device_world_single_agent_sync_and_map_guard(tool, tmp_path):
    """The single-agent run_step path works in compact mode, and registering
    a materially different map on a shared pipeline raises."""
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.harness.replay import ClosedLoopRunner
    from mmfn_tpu.harness.agents import MMFNAgent
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)
    agent = MMFNAgent({"variant": "rad", "model": model,
                       "variables": variables, "config": cfg,
                       "device_world": True,
                       "tmp_dir": str(tmp_path / "a0"), "rmap_tool": tool})
    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (60.0, 1.75, 0.0)],
                         index=0)
    runner = ClosedLoopRunner(max_wall_seconds=600)
    record = runner.run_route(agent, config, STRAIGHT_XODR, max_ticks=8,
                              world_kwargs={"compact_sensors": True})
    assert record.status.startswith(("Failed", "Completed"))
    assert agent.pid_metadata

    other_dir = tmp_path / "other" / "opendrive"
    os.makedirs(other_dir)
    (other_dir / "opstr.txt").write_text(CURVED_XODR)
    assert not build_rmap([str(other_dir)], tool_path=tool)
    other = RoughMap().read(str(other_dir / "a.rmap"))
    with pytest.raises(ValueError, match="different map"):
        agent.pipeline.set_map(other)


def test_crop_lanes_static_shape_on_small_maps(curved_map):
    """Maps with fewer chunks than max_lanes still yield the STATIC
    (max_lanes, N, F) lane tensor (padding rows zeroed) — the host cropper's
    static-pad contract (CLAUDE.md: ragged -> pad + mask)."""
    from mmfn_tpu.harness.device_world import crop_lanes, map_tables

    tables = {k: jnp.asarray(v) for k, v in map_tables(curved_map).items()}
    L = tables["polys"].shape[0]
    max_lanes = L + 11
    pose = jnp.asarray([5.0, 1.75, 0.0], jnp.float32)
    lanes, lane_num = jax.jit(crop_lanes, static_argnums=(2,))(
        pose, tables, max_lanes)
    assert lanes.shape[0] == max_lanes
    assert 1 <= int(lane_num) <= L
    # padding rows (beyond the map's chunk count) are all-zero
    assert not np.asarray(lanes[L:]).any()


def test_road_position_of_picks_chunk_covering_s(tool, tmp_path):
    """Long lanes split into chunks sharing (road_id, lane_id):
    road_position_of must use the chunk covering s, not the first match —
    on the curved road the first chunk's frame is hundreds of meters away
    and points the wrong way (round-trips exactly after the fix)."""
    from mmfn_tpu.mapping.rough_map import (resolve_road_position,
                                            road_position_of)

    d = tmp_path / "opendrive"
    d.mkdir()
    (d / "opstr.txt").write_text(CURVED_XODR)
    assert not build_rmap([str(d)], tool_path=tool)
    rmap = RoughMap().read(str(d / "a.rmap"))
    n_chunks = sum(1 for l in rmap.lanes
                   if l.road_id == "0" and l.lane_id == -1
                   and l.node_s is not None)
    assert n_chunks > 1, "fixture must exercise multi-chunk lanes"
    # deep into the last straight (s=250, past every earlier chunk)
    x, y, _ = resolve_road_position(rmap, "0", 250.0, -1.0)
    rid, s, t = road_position_of(rmap, x, y)
    assert rid == "0"
    assert abs(s - 250.0) < 1.0
    assert abs(t + 1.0) < 0.1


@pytest.mark.slow
def test_device_world_mesh_matches_single_device(curved_map):
    """dispatch_fleet over a 4-device mesh == the meshless program, including
    a fleet size that does not divide the mesh (pad + slice back); RNG keys
    ride the GLOBAL vehicle index, so the device layout cannot shift them."""
    from jax.sharding import Mesh
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.harness.device_world import DeviceWorldPipeline
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    rng = np.random.default_rng(7)
    payloads = []
    for i in range(3):                      # 3 does not divide 4
        actors = np.zeros((ACTOR_SLAB, 6), np.float32)
        actors[0] = [8.0 + i, 0.5, 1.0, 0.0, 1.5, float(i % 5)]
        avalid = np.zeros(ACTOR_SLAB, np.float32)
        avalid[0] = 1.0
        payloads.append({
            "pose": np.array([4.0 * i, 1.75, 0.1 * i], np.float32),
            "target_point": rng.normal(size=2).astype(np.float32),
            "speed": np.float32(3.0 + i),
            "actors": actors, "actors_valid": avalid,
            "rain": np.float32(0.0), "brightness": np.float32(1.0),
            "frame": np.int32(5 + i),
        })

    plain = DeviceWorldPipeline(model, variables, cfg)
    plain.set_map(curved_map)
    want = np.asarray(plain.dispatch_fleet(payloads))

    mesh = Mesh(np.array(jax.devices()[:4]), ("fleet",))
    sharded = DeviceWorldPipeline(model, variables, cfg, mesh=mesh)
    sharded.set_map(curved_map)
    got = np.asarray(sharded.dispatch_fleet(payloads))

    assert got.shape == want.shape == (3, cfg.pred_len, 2)
    # n=3 and the padded n=4 compile to different reduction orders; the
    # residual is pure f32 reassociation (measured max rel ~2.6e-5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.02)


@pytest.mark.slow
def test_device_world_chunked_synthesis_matches_monolithic(curved_map):
    """synth_chunk (lax.map scan-of-vmap — the structural fix for the
    width-96 XLA compile wall, docs/PERFORMANCE.md) produces the same
    waypoints as the monolithic vmap: per-vehicle RNG is keyed by the global
    index, so the chunking cannot shift any stream. Includes a width that
    does not divide the chunk (lax.map's remainder path)."""
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.harness.device_world import DeviceWorldPipeline
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "rad")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)

    rng = np.random.default_rng(11)
    payloads = []
    for i in range(5):                      # 5 % 2 != 0: remainder path
        actors = np.zeros((ACTOR_SLAB, 6), np.float32)
        actors[0] = [6.0 + i, -0.5, 0.5, 0.0, 1.5, float(i % 5)]
        avalid = np.zeros(ACTOR_SLAB, np.float32)
        avalid[0] = 1.0
        payloads.append({
            "pose": np.array([3.0 * i, 1.75, 0.05 * i], np.float32),
            "target_point": rng.normal(size=2).astype(np.float32),
            "speed": np.float32(2.0 + i),
            "actors": actors, "actors_valid": avalid,
            "rain": np.float32(0.5), "brightness": np.float32(0.8),
            "frame": np.int32(9 + i),
        })

    mono = DeviceWorldPipeline(model, variables, cfg, synth_chunk=None)
    mono.set_map(curved_map)
    want = np.asarray(mono.dispatch_fleet(payloads))

    chunked = DeviceWorldPipeline(model, variables, cfg, synth_chunk=2)
    chunked.set_map(curved_map)
    got = np.asarray(chunked.dispatch_fleet(payloads))

    assert got.shape == want.shape == (5, cfg.pred_len, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_synth_birdview_matches_host_producer(curved_map):
    """Device birdview raster == host BirdViewProducer.produce + as_rgb
    (static sampling, dynamic boxes, 3-state lights, palette order) up to
    rasterization edge pixels: cv2 draws integer-rounded polygons and
    bilinear-rotates; the device tests exact geometry per pixel."""
    import jax.numpy as jnp
    from mmfn_tpu.harness.device_world import (light_slab_np, raster_tables,
                                               synth_birdview)
    from mmfn_tpu.mapping.birdview import BirdViewProducer

    producer = BirdViewProducer(curved_map)
    pose = (120.0, 3.0, 0.35)

    # boxes use the world's own 2e x 1.4e aspect (KinematicWorld box()):
    # the device slab only carries the extent, so both rasterizers must
    # derive the same rectangle from it
    host_actors = [(130.0, 5.0, 0.4, 4.0, 2.8),     # x, y, yaw, length, width
                   (112.0, -2.0, 3.3, 3.6, 2.52)]
    host_walkers = [(124.0, 8.0, 1.0, 0.8, 0.56)]
    host_lights = [(135.0, 3.5, "red"), (110.0, 0.0, "green")]
    want = BirdViewProducer.as_rgb(
        producer.produce(pose, actors=host_actors, lights=host_lights,
                         walkers=host_walkers))

    slab = np.zeros((8, 9), np.float32)
    for k, (ax, ay, ayaw, length, width) in enumerate(
            host_actors + host_walkers):
        slab[k, :2] = [ax - pose[0], ay - pose[1]]
        slab[k, 4] = length / 2.0
        slab[k, 6] = ayaw
        slab[k, 7] = float(k >= len(host_actors))
        slab[k, 8] = 1.0
    lights = light_slab_np(host_lights, np.asarray(pose[:2]))

    tables = {k: jnp.asarray(v) for k, v in raster_tables(producer).items()}
    got = np.asarray(synth_birdview(
        jnp.asarray(pose, jnp.float32), jnp.asarray(slab),
        jnp.asarray(lights), tables, producer.ppm, producer.target_size,
        producer.crop_size))

    assert got.shape == want.shape == (256, 256, 3)
    same = (got.astype(np.int32) == want.astype(np.int32)).all(axis=-1)
    # measured 99.2% — the residual is cv2's integer-rounded polygon edges
    # + bilinear rotation smear vs the device's exact per-pixel geometry
    assert same.mean() > 0.95, f"pixel agreement {same.mean():.3f}"
    # every palette layer the host drew appears on the device raster too
    # (few-pixel layers like the 6x4 px walker box are all edge, so gate on
    # area; the walker's presence is still covered by the global number)
    for rgb_val in np.unique(want.reshape(-1, 3), axis=0):
        mask = (want == rgb_val).all(-1)
        if mask.sum() < 200:
            continue
        got_there = (got[mask].astype(np.int32) == rgb_val).all(-1)
        assert got_there.mean() > 0.7, f"layer {rgb_val} lost"


@pytest.mark.slow
def test_device_world_img_variant_closed_loop(tool, tmp_path):
    """The img variant serves in device-world mode (VERDICT r4 #5): set_map
    builds the birdview canvas tables, the fused program synthesizes the
    camera (dimmed raster) + map stream (undimmed raster) on device, and the
    closed loop completes with a scored record."""
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.harness.replay import ClosedLoopRunner
    from mmfn_tpu.harness.agents import MMFNAgent
    from mmfn_tpu.models import build_model

    cfg = GlobalConfig(n_layer=1, max_lanes=16)
    model = build_model(cfg, "img")
    batch = synthetic_batch(batch_size=1, max_lanes=cfg.max_lanes)
    variables = jax.jit(model.init, static_argnums=(2,))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)
    agent = MMFNAgent({"variant": "img", "model": model,
                       "variables": variables, "config": cfg,
                       "device_world": True,
                       "tmp_dir": str(tmp_path / "a0"), "rmap_tool": tool})
    assert agent.pipeline.birdview
    config = RouteConfig(route_id="0", town="TownTest",
                         trajectory=[(0.0, 1.75, 0.0), (60.0, 1.75, 0.0)],
                         index=0)
    runner = ClosedLoopRunner(max_wall_seconds=600)
    record = runner.run_route(agent, config, STRAIGHT_XODR, max_ticks=8,
                              world_kwargs={"compact_sensors": True})
    assert record.status.startswith(("Failed", "Completed"))
    assert agent.pid_metadata, "img forward + PID never ran"
