"""Full-graph parity for the radar variant + converter-CLI round trip.

Extends the vec-variant graph with the radar GAT stream and the 4-group
stage-4 fusion (reference model_rad.py:419-611), then also round-trips the
torch weights through scripts/convert_torch_checkpoint.py to prove the CLI
produces a loadable, numerically-identical msgpack checkpoint.
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-config parity: the suite's heavy tail

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from mmfn_tpu.config import GlobalConfig  # noqa: E402
from mmfn_tpu.data.batch import Batch  # noqa: E402
from mmfn_tpu.models import build_model  # noqa: E402
from mmfn_tpu.utils.weights import convert_mmfn  # noqa: E402
from tests.test_parity_torch import _TorchGPT, _TorchGAT, _sd, _np  # noqa: E402
from tests.test_parity_full import _TorchMMFNVec, MAX_LANES, N_LAYER, RES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


from tests.conftest import clean_subprocess_env as _clean_env



class _TorchMMFNRad(_TorchMMFNVec):
    def __init__(self):
        super().__init__()
        self.encoder.radar_encoder = _TorchGAT()
        # stage-4 fusion becomes a 4-group transformer
        self.encoder.transformer4 = _TorchGPT(512, 4, 4, N_LAYER, 4)

    def forward(self, image, lidar, lanes, lane_num, radar, radar_adj,
                target_point, velocity):
        enc = self.encoder
        img = image.clone()
        img[:, 0] = (img[:, 0] - 0.485) / 0.229
        img[:, 1] = (img[:, 1] - 0.456) / 0.224
        img[:, 2] = (img[:, 2] - 0.406) / 0.225

        i = enc.image_encoder.features.layer1(self._stem(enc.image_encoder.features, img))
        l = enc.lidar_encoder._model.layer1(self._stem(enc.lidar_encoder._model, lidar))
        m = enc.vectornet_encoder(lanes, lane_num)

        r = None
        for k in range(1, 5):
            t = getattr(enc, f"transformer{k}")
            grids = [tF.adaptive_avg_pool2d(s, (8, 8)) for s in (i, l, m)]
            if k == 4:
                r = enc.radar_encoder(radar, radar_adj)
                outs = t(grids + [r], velocity)
                oi, ol, om, orad = outs
                r = r + orad
            else:
                oi, ol, om = t(grids, velocity)
            i = i + tF.interpolate(oi, size=i.shape[2:], mode="bilinear", align_corners=True)
            l = l + tF.interpolate(ol, size=l.shape[2:], mode="bilinear", align_corners=True)
            m = m + tF.interpolate(om, size=m.shape[2:], mode="bilinear", align_corners=True)
            if k < 4:
                i = getattr(enc.image_encoder.features, f"layer{k + 1}")(i)
                m = getattr(enc.img_map_encoder.features, f"layer{k + 1}")(m)
                l = getattr(enc.lidar_encoder._model, f"layer{k + 1}")(l)

        fused = (i.mean(dim=(2, 3)) + l.mean(dim=(2, 3)) + m.mean(dim=(2, 3))
                 + r.mean(dim=(2, 3)))
        z = self.join(fused)
        x = torch.zeros(z.shape[0], 2)
        wps = []
        for _ in range(4):
            z = self.decoder(x + target_point, z)
            x = x + self.output(z)
            wps.append(x)
        return torch.stack(wps, dim=1)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(7)
    tmodel = _TorchMMFNRad().eval()
    for mod in tmodel.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.uniform_(-0.3, 0.3)
            mod.running_var.uniform_(0.7, 1.3)

    b = 2
    data = dict(
        image=rng.integers(0, 255, size=(b, 3, RES, RES)).astype(np.float32),
        lidar=rng.integers(0, 6, size=(b, 2, RES, RES)).astype(np.float32) / 5,
        lanes=(rng.normal(size=(b, MAX_LANES, 10, 5)) * 5).astype(np.float32),
        lane_num=np.array([4, MAX_LANES], dtype=np.int32),
        radar=rng.normal(size=(b, 81, 5)).astype(np.float32),
        target=rng.normal(size=(b, 2)).astype(np.float32),
        vel=np.abs(rng.normal(size=(b,))).astype(np.float32) * 3,
    )
    data["lanes"][0, 4:] = 0
    data["radar_adj"] = (data["radar"][:, None, :, 1] - data["radar"][:, :, None, 1])
    with torch.no_grad():
        want = _np(tmodel(*[torch.from_numpy(data[k]) for k in
                            ("image", "lidar", "lanes", "lane_num", "radar",
                             "radar_adj", "target", "vel")]))
    return tmodel, data, want


def _batch(data):
    return Batch(
        image=jnp.asarray(data["image"].transpose(0, 2, 3, 1)),
        lidar_bev=jnp.asarray(data["lidar"].transpose(0, 2, 3, 1)),
        lanes=jnp.asarray(data["lanes"]), lane_num=jnp.asarray(data["lane_num"]),
        radar=jnp.asarray(data["radar"]), radar_adj=jnp.asarray(data["radar_adj"]),
        target_point=jnp.asarray(data["target"]), velocity=jnp.asarray(data["vel"]))


def test_full_mmfn_rad_parity(setup):
    tmodel, data, want = setup
    cfg = GlobalConfig(n_layer=N_LAYER, max_lanes=MAX_LANES, attn_pdrop=0.0,
                       matmul_precision="highest")
    model = build_model(cfg, "rad")
    variables = convert_mmfn(_sd(tmodel), "rad", n_layer=N_LAYER)
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        _batch(data), False))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_convert_cli_roundtrip(setup, tmp_path):
    tmodel, data, want = setup
    pth = str(tmp_path / "best_model.pth")
    torch.save(tmodel.state_dict(), pth)

    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "convert_torch_checkpoint.py"),
         pth, str(tmp_path), "--variant", "rad", "--max-lanes", str(MAX_LANES),
         "--n-layer", str(N_LAYER)],
        capture_output=True, text=True, env=_clean_env())
    assert proc.returncode == 0, proc.stderr[-2000:]

    from flax import serialization
    from mmfn_tpu.train import create_train_state
    from mmfn_tpu.data.synthetic import synthetic_batch

    cfg = GlobalConfig(n_layer=N_LAYER, max_lanes=MAX_LANES, attn_pdrop=0.0,
                       matmul_precision="highest")
    model = build_model(cfg, "rad")
    template = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  synthetic_batch(1, MAX_LANES, resolution=RES))
    with open(tmp_path / "best_model.msgpack", "rb") as f:
        state = serialization.from_bytes(template, f.read())
    got = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        _batch(data), False))
    np.testing.assert_allclose(got, want, atol=2e-3)
