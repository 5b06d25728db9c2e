"""Direct parity vs the ACTUAL reference sources (not hand-built replicas).

Each test instantiates the reference's own MMFN class — imported from
/root/reference/team_code/mmfn_utils/models/model_{img,vec,rad}.py via the
torchvision shim in tests/ref_shim.py — at the FULL published configuration
(n_layer=8, 256 px, reference GlobalConfig defaults), converts its real
``state_dict()`` with ``convert_mmfn``, and asserts end-to-end waypoint
parity against our flax rebuild.  This is the round-2 upgrade of
test_parity_full*.py: a failure here means the rebuild diverges from the
reference code itself (model_img.py:451, model_vec.py:626, model_rad.py:639).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-config parity: the suite's heavy tail

torch = pytest.importorskip("torch")

from mmfn_tpu.config import GlobalConfig  # noqa: E402
from mmfn_tpu.data.batch import Batch  # noqa: E402
from mmfn_tpu.models import build_model  # noqa: E402
from mmfn_tpu.utils.weights import convert_mmfn  # noqa: E402
from tests.ref_shim import (  # noqa: E402
    load_ref_module, randomize_bn_stats, state_dict_numpy,
)

RES = 256        # full reference input_resolution (config.py:14)
B = 2
MAX_LANES = 6    # static lane padding (reference pads per-batch; semantics equal)


def _full_inputs(rng):
    """One batch of every modality, in torch NCHW layout."""
    return {
        "image": rng.integers(0, 255, size=(B, 3, RES, RES)).astype(np.float32),
        "lidar": rng.integers(0, 6, size=(B, 2, RES, RES)).astype(np.float32) / 5,
        "maps": rng.integers(0, 255, size=(B, 3, RES, RES)).astype(np.float32),
        "lanes": (rng.normal(size=(B, MAX_LANES, 10, 5)) * 5).astype(np.float32),
        "lane_num": np.array([3, MAX_LANES], dtype=np.int32),
        "radar": rng.normal(size=(B, 81, 5)).astype(np.float32),
        "radar_adj": (rng.normal(size=(B, 81, 81)) > 0).astype(np.float32),
        "target": rng.normal(size=(B, 2)).astype(np.float32),
        "vel": np.abs(rng.normal(size=(B,))).astype(np.float32) * 3,
    }


def _ref_forward(variant, x):
    mod = load_ref_module(f"model_{variant}")
    cfgmod = load_ref_module("ref_config")
    torch.manual_seed(42)   # reference init draws from torch's global RNG
    tmodel = mod.MMFN(cfgmod.GlobalConfig(), "cpu").eval()
    randomize_bn_stats(tmodel)

    t = {k: torch.from_numpy(v) for k, v in x.items()}
    # zero padded lanes exactly like our collate does
    t["lanes"][0, int(x["lane_num"][0]):] = 0
    vectormaps = [[t["lanes"]], [t["lane_num"]], MAX_LANES]
    with torch.no_grad():
        if variant == "img":
            want = tmodel([t["image"]], [t["lidar"]], [t["maps"]], None,
                          None, None, t["target"], t["vel"])
        elif variant == "vec":
            want = tmodel([t["image"]], [t["lidar"]], None, vectormaps,
                          None, None, t["target"], t["vel"])
        else:
            want = tmodel([t["image"]], [t["lidar"]], None, vectormaps,
                          [t["radar"]], [t["radar_adj"]], t["target"], t["vel"])
    return state_dict_numpy(tmodel), want.numpy()


def _ours_forward(variant, sd, x):
    cfg = GlobalConfig(max_lanes=MAX_LANES, matmul_precision="highest")
    model = build_model(cfg, variant)
    variables = convert_mmfn(sd, variant, n_layer=cfg.n_layer)
    lanes = x["lanes"].copy()
    lanes[0, int(x["lane_num"][0]):] = 0
    batch = Batch(
        image=jnp.asarray(x["image"].transpose(0, 2, 3, 1)),
        lidar_bev=jnp.asarray(x["lidar"].transpose(0, 2, 3, 1)),
        target_point=jnp.asarray(x["target"]),
        velocity=jnp.asarray(x["vel"]),
        map_img=jnp.asarray(x["maps"].transpose(0, 2, 3, 1)),
        lanes=jnp.asarray(lanes),
        lane_num=jnp.asarray(x["lane_num"]),
        radar=jnp.asarray(x["radar"]),
        radar_adj=jnp.asarray(x["radar_adj"]),
    )
    fwd = jax.jit(model.apply, static_argnums=2)
    out = fwd({"params": variables["params"],
               "batch_stats": variables["batch_stats"]}, batch, False)
    return np.asarray(out)


@pytest.mark.parametrize("variant", ["img", "vec", "rad"])
def test_reference_source_parity(variant, rng):
    """Our flax MMFN == the reference's own torch MMFN, full config."""
    x = _full_inputs(rng)
    sd, want = _ref_forward(variant, x)
    got = _ours_forward(variant, sd, x)
    assert want.shape == (B, 4, 2)
    # 8 fusion layers x 4 scales accumulate ~1e-3 of f32 op-order noise on
    # waypoints of magnitude ~1-3; 5e-3 absolute is still ~1e-3 relative
    np.testing.assert_allclose(got, want, atol=5e-3)


# --------------------------------------------------------------------------- #
# Baselines, directly vs team_code/benchmarks/{aim,cilrs,transfuser}/model.py
# --------------------------------------------------------------------------- #

def _baseline_batch(x, with_lidar=False):
    return Batch(
        image=jnp.asarray(x["image"].transpose(0, 2, 3, 1)),
        lidar_bev=jnp.asarray(x["lidar"].transpose(0, 2, 3, 1)),
        target_point=jnp.asarray(x["target"]),
        velocity=jnp.asarray(x["vel"]),
    )


def test_reference_aim_parity(rng):
    """AIM: image ResNet34 -> join -> cat-mode GRU (aim/model.py:68-120)."""
    from mmfn_tpu.models import get_entry_point
    from mmfn_tpu.utils.weights import convert_aim

    x = _full_inputs(rng)
    mod = load_ref_module("aim_model")
    cfgmod = load_ref_module("aim_config")
    torch.manual_seed(42)
    tmodel = mod.AIM(cfgmod.GlobalConfig(), "cpu").eval()
    randomize_bn_stats(tmodel)
    timg = torch.from_numpy(x["image"])
    with torch.no_grad():
        encoding = [tmodel.image_encoder([timg])]
        want = tmodel(encoding, torch.from_numpy(x["target"])).numpy()

    cfg = GlobalConfig(matmul_precision="highest")
    model = get_entry_point("aim")(cfg)
    variables = convert_aim(state_dict_numpy(tmodel))
    got = np.asarray(jax.jit(model.apply, static_argnums=2)(
        variables, _baseline_batch(x), False))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_reference_cilrs_parity(rng):
    """CILRS: ResNet18 + branched controller + aliased velocity head
    (cilrs/model.py:17,92-104)."""
    from mmfn_tpu.models import get_entry_point
    from mmfn_tpu.utils.weights import convert_cilrs

    x = _full_inputs(rng)
    command = np.array([3, 5], dtype=np.int32)
    mod = load_ref_module("cilrs_model")
    cfgmod = load_ref_module("cilrs_config")
    torch.manual_seed(42)
    tmodel = mod.CILRS(cfgmod.GlobalConfig(), "cpu").eval()
    randomize_bn_stats(tmodel)
    with torch.no_grad():
        enc = [tmodel.encoder([torch.from_numpy(x["image"])])]
        steer, throttle, brake, vel_pred = tmodel(
            enc, torch.from_numpy(x["vel"]), torch.from_numpy(command))

    cfg = GlobalConfig(matmul_precision="highest")
    model = get_entry_point("cilrs")(cfg)
    variables = convert_cilrs(state_dict_numpy(tmodel))
    g_steer, g_throttle, g_brake, g_vel = jax.jit(
        model.apply, static_argnums=3)(
        variables, _baseline_batch(x), jnp.asarray(command), False)
    np.testing.assert_allclose(np.asarray(g_steer), steer.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_throttle), throttle.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_brake), brake.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_vel), vel_pred.numpy(), atol=2e-2)


def test_reference_transfuser_parity(rng):
    """TransFuser: 2-group fusion, add-mode GRU (transfuser/model.py:413-469)."""
    from mmfn_tpu.models import get_entry_point
    from mmfn_tpu.utils.weights import convert_transfuser

    x = _full_inputs(rng)
    mod = load_ref_module("transfuser_model")
    cfgmod = load_ref_module("transfuser_config")
    tcfg = cfgmod.GlobalConfig()
    torch.manual_seed(42)
    tmodel = mod.TransFuser(tcfg, "cpu").eval()
    randomize_bn_stats(tmodel)
    with torch.no_grad():
        want = tmodel([torch.from_numpy(x["image"])],
                      [torch.from_numpy(x["lidar"])],
                      torch.from_numpy(x["target"]),
                      torch.from_numpy(x["vel"])).numpy()

    cfg = GlobalConfig(matmul_precision="highest", n_layer=tcfg.n_layer)
    model = get_entry_point("transfuser")(cfg)
    variables = convert_transfuser(state_dict_numpy(tmodel), n_layer=tcfg.n_layer)
    got = np.asarray(jax.jit(model.apply, static_argnums=2)(
        variables, _baseline_batch(x), False))
    np.testing.assert_allclose(got, want, atol=5e-3)   # deep 4-scale fusion
