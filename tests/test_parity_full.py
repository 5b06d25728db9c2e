"""Full-graph parity vs a torch REPLICA of MMFN-vec (fast diagnostic).

DEMOTED to a secondary check: tests/test_parity_reference.py now compares
against the reference's own model sources at full config. This replica-based
test remains because it runs the same wiring at reduced size (n_layer=1,
64 px), so a failure localizes much faster than the full-config test.
"""

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
from tests.test_parity_torch import _TorchResNet, _TorchGPT, _sd, _np  # noqa: E402

N_LAYER = 1
MAX_LANES = 6
RES = 64


# ---- torch reference assembly (reference checkpoint key naming) ------------ #

class _Features(tnn.Module):
    def __init__(self, stages, in_ch):
        super().__init__()
        self.features = _TorchResNet(stages, in_ch)


class _LidarEnc(tnn.Module):
    def __init__(self):
        super().__init__()
        self._model = _TorchResNet((2, 2, 2, 2), 2)


class _TorchVectornet(tnn.Module):
    def __init__(self, hidden=64):
        super().__init__()
        layers = tnn.Sequential()
        in_ch = 7
        for i in range(3):
            mlp = tnn.Module()
            mlp.mlp = tnn.Sequential(tnn.Linear(in_ch, hidden), tnn.LayerNorm(hidden),
                                     tnn.ReLU())
            layers.add_module(f"mlp_{i}", mlp)
            in_ch = hidden * 2
        sub = tnn.Module()
        sub.layers = layers
        self.lane_subgraph = sub
        self.pos_emb = tnn.Sequential(tnn.Linear(2, 64), tnn.LayerNorm(64),
                                      tnn.GELU(), tnn.Linear(64, 64))
        l2l = tnn.Module()
        l2l.to_qkv = tnn.Linear(128, 384, bias=False)
        l2l.to_out = tnn.Sequential(tnn.Linear(128, 128), tnn.Dropout(0.0))
        self.L2L = l2l
        self.agent_fusion = tnn.Sequential(tnn.Linear(192, 128), tnn.LayerNorm(128),
                                           tnn.GELU(), tnn.Linear(128, 128))
        self.generator = tnn.Sequential(tnn.Linear(128, 64), tnn.LayerNorm(64),
                                        tnn.GELU(), tnn.Linear(64, 64 * 64 * 64))

    def forward(self, lanes, lane_num):
        b, max_lanes = lanes.shape[:2]
        vec = torch.cat([lanes[:, :, :-1, 0:2], lanes[:, :, 1:, 0:2],
                         lanes[:, :, 1:, 2:]], dim=-1)
        x = vec
        for i in range(3):
            x = getattr(self.lane_subgraph.layers, f"mlp_{i}").mlp(x)
            pooled, _ = torch.max(x, dim=-2, keepdim=True)
            x = torch.cat([x, pooled.expand_as(x)], dim=-1)
        lane_token, _ = torch.max(x, dim=-2)            # (B, L, 128)

        mask = torch.zeros(b, 1, max_lanes)
        for i in range(b):
            mask[i, 0, :int(lane_num[i])] = 1
        qkv = self.L2L.to_qkv(lane_token).chunk(3, dim=-1)
        heads = 2

        def split(t):
            return t.view(b, max_lanes, heads, -1).transpose(1, 2)

        q, k, v = map(split, qkv)
        dots = q @ k.transpose(-1, -2) * (64 ** -0.5)
        dots = dots.masked_fill(mask.unsqueeze(1) == 0, -1e9)
        out = (tF.softmax(dots, dim=-1) @ v).transpose(1, 2).reshape(b, max_lanes, 128)
        lane_token = self.L2L.to_out(out)

        pos = self.pos_emb(torch.zeros(b, max_lanes, 2))
        fused = self.agent_fusion(torch.cat([lane_token, pos], dim=-1))
        out = self.generator(fused[:, 0, :])
        return out.view(b, 64, 64, 64)                  # NCHW


class _TorchMMFNVec(tnn.Module):
    def __init__(self):
        super().__init__()
        enc = tnn.Module()
        enc.image_encoder = _Features((3, 4, 6, 3), 3)
        enc.img_map_encoder = _Features((3, 4, 6, 3), 3)
        enc.lidar_encoder = _LidarEnc()
        enc.vectornet_encoder = _TorchVectornet()
        for i, c in enumerate((64, 128, 256, 512)):
            setattr(enc, f"transformer{i + 1}", _TorchGPT(c, 4, 4, N_LAYER, 3))
        self.encoder = enc
        self.join = tnn.Sequential(tnn.Linear(512, 256), tnn.ReLU(),
                                   tnn.Linear(256, 128), tnn.ReLU(),
                                   tnn.Linear(128, 64), tnn.ReLU())
        self.decoder = tnn.GRUCell(2, 64)
        self.output = tnn.Linear(64, 2)

    @staticmethod
    def _stem(net, x):
        return tF.max_pool2d(tF.relu(net.bn1(net.conv1(x))), 3, 2, 1)

    def forward(self, image, lidar, lanes, lane_num, target_point, velocity):
        enc = self.encoder
        img = image.clone()
        img[:, 0] = (img[:, 0] - 0.485) / 0.229
        img[:, 1] = (img[:, 1] - 0.456) / 0.224
        img[:, 2] = (img[:, 2] - 0.406) / 0.225

        i = enc.image_encoder.features.layer1(self._stem(enc.image_encoder.features, img))
        l = enc.lidar_encoder._model.layer1(self._stem(enc.lidar_encoder._model, lidar))
        m = enc.vectornet_encoder(lanes, lane_num)

        for k in range(1, 5):
            t = getattr(enc, f"transformer{k}")
            grids = [tF.adaptive_avg_pool2d(s, (8, 8)) for s in (i, l, m)]
            oi, ol, om = t(grids, velocity)
            i = i + tF.interpolate(oi, size=i.shape[2:], mode="bilinear", align_corners=True)
            l = l + tF.interpolate(ol, size=l.shape[2:], mode="bilinear", align_corners=True)
            m = m + tF.interpolate(om, size=m.shape[2:], mode="bilinear", align_corners=True)
            if k < 4:
                i = getattr(enc.image_encoder.features, f"layer{k + 1}")(i)
                m = getattr(enc.img_map_encoder.features, f"layer{k + 1}")(m)
                l = getattr(enc.lidar_encoder._model, f"layer{k + 1}")(l)

        fused = i.mean(dim=(2, 3)) + l.mean(dim=(2, 3)) + m.mean(dim=(2, 3))
        z = self.join(fused)
        x = torch.zeros(z.shape[0], 2)
        wps = []
        for _ in range(4):
            z = self.decoder(x + target_point, z)
            x = x + self.output(z)
            wps.append(x)
        return torch.stack(wps, dim=1)


def test_full_mmfn_vec_parity(rng):
    tmodel = _TorchMMFNVec().eval()
    for mod in tmodel.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.uniform_(-0.3, 0.3)
            mod.running_var.uniform_(0.7, 1.3)

    b = 2
    image = rng.integers(0, 255, size=(b, 3, RES, RES)).astype(np.float32)
    lidar = rng.integers(0, 6, size=(b, 2, RES, RES)).astype(np.float32) / 5
    lanes = (rng.normal(size=(b, MAX_LANES, 10, 5)) * 5).astype(np.float32)
    lane_num = np.array([3, MAX_LANES], dtype=np.int32)
    # zero out padded lanes like the collate does
    lanes[0, 3:] = 0
    target = rng.normal(size=(b, 2)).astype(np.float32)
    vel = np.abs(rng.normal(size=(b,))).astype(np.float32) * 3

    with torch.no_grad():
        want = _np(tmodel(torch.from_numpy(image), torch.from_numpy(lidar),
                          torch.from_numpy(lanes), torch.from_numpy(lane_num),
                          torch.from_numpy(target), torch.from_numpy(vel)))

    cfg = GlobalConfig(n_layer=N_LAYER, max_lanes=MAX_LANES,
                       matmul_precision="highest")
    model = build_model(cfg, "vec")
    variables = convert_mmfn(_sd(tmodel), "vec", n_layer=N_LAYER)
    batch = Batch(
        image=jnp.asarray(image.transpose(0, 2, 3, 1)),
        lidar_bev=jnp.asarray(lidar.transpose(0, 2, 3, 1)),
        lanes=jnp.asarray(lanes), lane_num=jnp.asarray(lane_num),
        target_point=jnp.asarray(target), velocity=jnp.asarray(vel))
    got = np.asarray(model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch, False))

    np.testing.assert_allclose(got, want, atol=2e-3)
