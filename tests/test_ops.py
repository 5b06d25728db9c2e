"""Golden tests for preprocessing ops against numpy oracles / reference math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmfn_tpu.ops import (
    lidar_to_histogram_features,
    lidar_to_histogram_features_np,
    transform_2d_points,
    transform_2d_points_np,
    radar_to_size_np,
    radar_adjacency,
    radar_adjacency_np,
    scale_and_crop_image,
    normalize_imagenet,
    upsample_bilinear_align_corners,
    adaptive_avg_pool,
)
from mmfn_tpu.ops.lidar import pad_points, _bev_hist_pallas


# --------------------------------------------------------------------------- #
# transform_2d_points: compare against the reference's matrix formulation
# --------------------------------------------------------------------------- #

def _reference_transform(xyz, r1, t1_x, t1_y, r2, t2_x, t2_y):
    xy1 = xyz.copy()
    xy1[:, 2] = 1
    c, s = np.cos(r1), np.sin(r1)
    r1_to_world = np.array([[c, s, t1_x], [-s, c, t1_y], [0, 0, 1]])
    world = r1_to_world @ xy1.T
    c, s = np.cos(r2), np.sin(r2)
    r2_to_world = np.array([[c, s, t2_x], [-s, c, t2_y], [0, 0, 1]])
    out = (np.linalg.inv(r2_to_world) @ world).T
    out[:, 2] = xyz[:, 2]
    return out


def test_transform_2d_points_matches_matrix_form(rng):
    pts = rng.normal(size=(500, 3)).astype(np.float64) * 20
    args = (0.3, 1.5, -2.0, -1.1, 0.4, 3.3)
    want = _reference_transform(pts, *args)
    got_np = transform_2d_points_np(pts, *args)
    np.testing.assert_allclose(got_np, want, atol=1e-9)
    got_jax = np.asarray(transform_2d_points(jnp.asarray(pts), *args))
    np.testing.assert_allclose(got_jax, want, atol=1e-5)


# --------------------------------------------------------------------------- #
# LiDAR BEV histogram
# --------------------------------------------------------------------------- #

def test_bev_histogram_oracle_shape_and_range(rng):
    pts = rng.uniform(low=[-20, -30, -4], high=[20, 12, 2], size=(5000, 3))
    hist = lidar_to_histogram_features_np(pts)
    assert hist.shape == (256, 256, 2)
    assert hist.min() >= 0.0 and hist.max() <= 1.0
    # total mass: every in-range point contributes (before clipping)
    assert hist.sum() > 0


def test_bev_histogram_xla_matches_oracle(rng):
    pts = rng.uniform(low=[-20, -30, -4], high=[20, 12, 2], size=(4000, 3)).astype(np.float32)
    want = lidar_to_histogram_features_np(pts)
    padded = pad_points(pts, 4096)
    got = np.asarray(lidar_to_histogram_features(jnp.asarray(padded), use_pallas=False))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bev_histogram_pallas_interpret_matches_oracle(rng):
    pts = rng.uniform(low=[-18, -26, -4], high=[18, 10, 2], size=(2000, 3)).astype(np.float32)
    want = lidar_to_histogram_features_np(pts)
    padded = pad_points(pts, 4096)
    got = np.asarray(_bev_hist_pallas(jnp.asarray(padded), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bev_counts_np_matches_oracle(rng):
    from mmfn_tpu.ops.lidar import HIST_MAX_PER_PIXEL, bev_counts_np

    pts = rng.uniform(low=[-20, -30, -4], high=[20, 12, 2], size=(6000, 3))
    want = lidar_to_histogram_features_np(pts)
    counts = bev_counts_np(pts)
    assert counts.dtype == np.uint8 and counts.shape == (256, 256, 2)
    np.testing.assert_allclose(
        counts.astype(np.float32) / HIST_MAX_PER_PIXEL, want, atol=1e-6)
    # clipping: many points in one cell saturate at 5
    stack = np.tile(np.array([[0.05, 0.05, 1.0]]), (10, 1))
    assert bev_counts_np(stack).max() == 5


def test_bev_histogram_clips_at_five():
    pts = np.tile(np.array([[0.05, 0.05, 1.0]]), (10, 1))  # 10 pts in one cell, above
    hist = lidar_to_histogram_features_np(pts)
    assert hist.max() == 1.0
    padded = pad_points(pts.astype(np.float32), 1024)
    got = np.asarray(lidar_to_histogram_features(jnp.asarray(padded), use_pallas=False))
    np.testing.assert_allclose(got, hist, atol=1e-6)


# --------------------------------------------------------------------------- #
# Radar
# --------------------------------------------------------------------------- #

def test_radar_to_size_pads_short_input(rng):
    data = rng.normal(size=(10, 5))
    out = radar_to_size_np(data, (81, 5))
    assert out.shape == (81, 5)
    np.testing.assert_allclose(out[:10], data)
    assert np.all(out[10:] == 0)


def test_radar_to_size_deletes_smallest_ttc(rng):
    data = rng.normal(size=(100, 5))
    data[:, 3] = np.abs(data[:, 3]) + 0.1  # depth > 0
    out = radar_to_size_np(data, (81, 5))
    assert out.shape == (81, 5)
    # survivors keep original relative order and are the 81 smallest |v/d|
    ttc_inv = np.abs(data[:, 0] / data[:, 3])
    keep = np.ones(100, dtype=bool)
    keep[(-ttc_inv).argsort()[:19]] = False
    np.testing.assert_allclose(out, data[keep])


def test_radar_adjacency(rng):
    radar = rng.normal(size=(81, 5)).astype(np.float32)
    want = radar_adjacency_np(radar)
    got = np.asarray(radar_adjacency(jnp.asarray(radar)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert want[3, 7] == pytest.approx(radar[7, 1] - radar[3, 1])


# --------------------------------------------------------------------------- #
# Image ops
# --------------------------------------------------------------------------- #

def test_scale_and_crop_center_crop(rng):
    img = rng.integers(0, 255, size=(256, 900, 3), dtype=np.uint8)
    out = scale_and_crop_image(img, scale=1, crop=256)
    assert out.shape == (256, 256, 3)
    np.testing.assert_array_equal(out, img[:, 322:578])


def test_normalize_imagenet_channelwise():
    x = jnp.ones((1, 4, 4, 3), jnp.float32)
    y = np.asarray(normalize_imagenet(x))
    np.testing.assert_allclose(y[0, 0, 0], [(1 - 0.485) / 0.229, (1 - 0.456) / 0.224, (1 - 0.406) / 0.225], rtol=1e-6)


# --------------------------------------------------------------------------- #
# Bilinear align-corners upsample vs torch
# --------------------------------------------------------------------------- #

def test_upsample_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=4, mode="bilinear", align_corners=True
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_adaptive_pool_matches_torch(rng):
    torch = pytest.importorskip("torch")
    for size in (64, 32, 16, 8, 12):
        x = rng.normal(size=(2, size, size, 6)).astype(np.float32)
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (8, 8)
        ).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), (8, 8)))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_bev_histogram_pallas_ragged_and_small_counts(rng):
    """Point counts not divisible by the chunk size must not be truncated,
    and counts below one chunk must not return an unwritten buffer."""
    from mmfn_tpu.ops.lidar import _bev_hist_pallas

    for n in (3000, 5000):
        pts = rng.uniform(low=[-18, -26, -4], high=[18, 10, 2],
                          size=(n, 3)).astype(np.float32)
        want = lidar_to_histogram_features_np(pts)
        padded = pad_points(pts, n)        # valid column, no chunk padding
        got = np.asarray(_bev_hist_pallas(jnp.asarray(padded), interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"n={n}")


def test_resize_to_single_pixel():
    """align_corners resize to size 1 samples pixel 0 (torch semantics) —
    the general interpolation formula would divide by zero."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from mmfn_tpu.ops.resize import resize_bilinear_align_corners

    x = np.arange(2 * 5 * 7 * 3, dtype=np.float32).reshape(2, 5, 7, 3)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (1, 1)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(1, 1),
                         mode="bilinear", align_corners=True
                         ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_scale_and_crop_matches_pil():
    """scale != 1 must reproduce the reference's PIL default resample
    (bicubic for RGB), not nearest sampling."""
    from PIL import Image
    from mmfn_tpu.ops.image import scale_and_crop_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(300, 400, 3), dtype=np.uint8)
    got = scale_and_crop_image(img, scale=2, crop=128)
    ref = np.asarray(Image.fromarray(img).resize((200, 150)))
    want = ref[150 // 2 - 64:150 // 2 + 64, 200 // 2 - 64:200 // 2 + 64]
    np.testing.assert_array_equal(got, want)


def test_fused_attention_matches_einsum(rng):
    """The Pallas fused-attention kernel (ops/attention.py) must reproduce
    softmax(qk^T/sqrt(d))v exactly as the einsum path in
    models/gpt.py:SelfAttention — every fusion-stage shape (T = 64*groups,
    head dims 16..128)."""
    import jax.numpy as jnp
    from mmfn_tpu.ops.attention import _fused_attention

    for t, d in ((128, 16), (192, 64), (256, 128)):
        q = jnp.asarray(rng.normal(size=(2, 4, t, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 4, t, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 4, t, d)).astype(np.float32))
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d).astype(np.float32)
        att = jax.nn.softmax(att, axis=-1)
        want = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        got = _fused_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_fusion_transformer_pallas_attention_matches_xla(rng):
    """FusionTransformer with attn_impl='pallas' (inference) must match the
    einsum implementation on identical variables; train=True must fall back
    to the einsum path (the kernel has no VJP) and still differentiate."""
    import jax.numpy as jnp
    from mmfn_tpu.models.gpt import FusionTransformer

    kw = dict(n_embd=64, n_head=4, block_exp=4, n_layer=2, n_groups=3)
    xla = FusionTransformer(attn_impl="xla", **kw)
    pal = FusionTransformer(attn_impl="pallas", **kw)
    grids = [jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
             for _ in range(3)]
    vel = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    variables = xla.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, grids, vel, False)
    out_x = xla.apply(variables, grids, vel, False)
    out_p = pal.apply(variables, grids, vel, False)
    for a, b in zip(out_x, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    def loss(params):
        outs = pal.apply({"params": params}, grids, vel, True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
        return sum(jnp.sum(o ** 2) for o in outs)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))
