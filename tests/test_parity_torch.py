"""Numerical parity vs PyTorch for every converted component.

Each test builds a compact torch module whose state_dict uses the reference
checkpoint naming, converts the (randomly initialized) weights with
mmfn_tpu.utils.weights, and checks outputs match in float32. This validates
both the converters and our NHWC reimplementations (conv padding, BN eval
stats, pooling, gate math, attention/pos-emb layout).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from mmfn_tpu.models.resnet import ResNet  # noqa: E402
from mmfn_tpu.models.decoder import TorchGRUCell  # noqa: E402
from mmfn_tpu.models.gpt import FusionTransformer  # noqa: E402
from mmfn_tpu.models.gat import RadarGAT  # noqa: E402
from mmfn_tpu.utils.weights import (  # noqa: E402
    convert_resnet, convert_fusion_transformer, convert_radar_gat, _linear,
)

HI = jax.lax.Precision.HIGHEST


def _np(t):
    return t.detach().cpu().numpy()


def _sd(module):
    return {k: _np(v) for k, v in module.state_dict().items()}


# --------------------------------------------------------------------------- #
# ResNet
# --------------------------------------------------------------------------- #

class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = tF.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return tF.relu(out + idt)


class _TorchResNet(tnn.Module):
    def __init__(self, stage_sizes, in_ch):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        widths = (64, 128, 256, 512)
        cin = 64
        for i, (w, n) in enumerate(zip(widths, stage_sizes)):
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(_TorchBasicBlock(cin if j == 0 else w, w, stride))
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            cin = w

    def forward(self, x):
        x = tF.max_pool2d(tF.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x.mean(dim=(2, 3))


@pytest.mark.parametrize("stage_sizes,in_ch", [((2, 2, 2, 2), 2), ((3, 4, 6, 3), 3)])
def test_resnet_parity(stage_sizes, in_ch, rng):
    tmodel = _TorchResNet(stage_sizes, in_ch).eval()
    # randomize BN running stats so eval-mode normalization is actually tested
    for m in tmodel.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    x = rng.normal(size=(2, in_ch, 64, 64)).astype(np.float32)
    want = _np(tmodel(torch.from_numpy(x)))

    params, stats = convert_resnet(_sd(tmodel), stage_sizes)
    fmodel = ResNet(stage_sizes=stage_sizes, precision=HI)
    got = np.asarray(fmodel.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), False))
    np.testing.assert_allclose(got, want, atol=2e-4)


# --------------------------------------------------------------------------- #
# GRU cell
# --------------------------------------------------------------------------- #

def test_gru_cell_parity(rng):
    tcell = tnn.GRUCell(2, 64)
    x = rng.normal(size=(3, 2)).astype(np.float32)
    h = rng.normal(size=(3, 64)).astype(np.float32)
    want = _np(tcell(torch.from_numpy(x), torch.from_numpy(h)))

    sd = _sd(tcell)
    params = {
        "weight_ih": _linear(sd["weight_ih"]),
        "weight_hh": _linear(sd["weight_hh"]),
        "bias_ih": sd["bias_ih"],
        "bias_hh": sd["bias_hh"],
    }
    cell = TorchGRUCell(2, 64, precision=HI)
    got = np.asarray(cell.apply({"params": params}, jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(got, want, atol=1e-4)


# --------------------------------------------------------------------------- #
# Fusion transformer (GPT)
# --------------------------------------------------------------------------- #

class _TorchAttn(tnn.Module):
    def __init__(self, c, h):
        super().__init__()
        self.key, self.query, self.value, self.proj = (
            tnn.Linear(c, c), tnn.Linear(c, c), tnn.Linear(c, c), tnn.Linear(c, c))
        self.h = h

    def forward(self, x):
        b, t, c = x.shape
        s = lambda m: m(x).view(b, t, self.h, c // self.h).transpose(1, 2)
        q, k, v = s(self.query), s(self.key), s(self.value)
        att = tF.softmax(q @ k.transpose(-2, -1) / math.sqrt(c // self.h), dim=-1)
        return self.proj((att @ v).transpose(1, 2).reshape(b, t, c))


class _TorchBlock(tnn.Module):
    def __init__(self, c, h, exp):
        super().__init__()
        self.ln1, self.ln2 = tnn.LayerNorm(c), tnn.LayerNorm(c)
        self.attn = _TorchAttn(c, h)
        self.mlp = tnn.Sequential(tnn.Linear(c, exp * c), tnn.ReLU(),
                                  tnn.Linear(exp * c, c), tnn.Dropout(0.0))

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        return x + self.mlp(self.ln2(x))


class _TorchGPT(tnn.Module):
    def __init__(self, c, h, exp, layers, groups):
        super().__init__()
        self.pos_emb = tnn.Parameter(torch.randn(1, groups * 64, c) * 0.1)
        self.vel_emb = tnn.Linear(1, c)
        self.blocks = tnn.Sequential(*[_TorchBlock(c, h, exp) for _ in range(layers)])
        self.ln_f = tnn.LayerNorm(c)
        self.groups = groups

    def forward(self, grids, vel):
        b = grids[0].shape[0]
        toks = torch.cat([g.permute(0, 2, 3, 1).reshape(b, 64, -1) for g in grids], dim=1)
        x = self.pos_emb + toks + self.vel_emb(vel.unsqueeze(1)).unsqueeze(1)
        x = self.ln_f(self.blocks(x))
        outs = []
        for i in range(self.groups):
            g = x[:, i * 64:(i + 1) * 64, :].view(b, 8, 8, -1).permute(0, 3, 1, 2)
            outs.append(g)
        return outs


@pytest.mark.parametrize("groups", [3, 4])
def test_fusion_transformer_parity(groups, rng):
    c, heads, exp, layers = 64, 4, 4, 2
    tmodel = _TorchGPT(c, heads, exp, layers, groups).eval()
    grids = [rng.normal(size=(2, c, 8, 8)).astype(np.float32) for _ in range(groups)]
    vel = np.abs(rng.normal(size=(2,))).astype(np.float32)
    with torch.no_grad():
        want = [_np(g) for g in tmodel([torch.from_numpy(g) for g in grids],
                                       torch.from_numpy(vel))]

    params = {}
    convert_fusion_transformer(_sd(tmodel), layers, "", "t", params)
    fmodel = FusionTransformer(n_embd=c, n_head=heads, block_exp=exp, n_layer=layers,
                               n_groups=groups, precision=HI)
    got = fmodel.apply({"params": params["t"]},
                       [jnp.asarray(g.transpose(0, 2, 3, 1)) for g in grids],
                       jnp.asarray(vel), False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 3, 1, 2), w, atol=1e-4)


# --------------------------------------------------------------------------- #
# Radar GAT
# --------------------------------------------------------------------------- #

class _TorchGAT(tnn.Module):
    def __init__(self, nfeat=5, nhid=81, heads=2, alpha=0.2):
        super().__init__()
        for i in range(heads):
            layer = tnn.Module()
            layer.W = tnn.Parameter(torch.randn(nfeat, 2 * nhid))
            layer.a = tnn.Parameter(torch.randn(2 * nhid, nhid))
            setattr(self, f"attention_{i}", layer)
        self.mlp_1 = tnn.Sequential(tnn.Linear(heads * nhid, 256), tnn.Dropout(0.0))
        self.mlp_2 = tnn.Sequential(tnn.Linear(heads * nhid, 128), tnn.Dropout(0.0))
        self.heads, self.alpha = heads, alpha

    def forward(self, x, adj):
        outs = []
        for i in range(self.heads):
            layer = getattr(self, f"attention_{i}")
            wh = x @ layer.W
            e = tF.leaky_relu(wh @ layer.a, self.alpha)
            att = tF.softmax(torch.where(adj > 0, e, torch.full_like(e, -9e15)), dim=-1)
            outs.append(tF.elu(att @ wh))
        x = torch.cat(outs, dim=1)
        x = self.mlp_1(tF.elu(x))
        x = self.mlp_2(x.transpose(1, 2))
        x = x.view(x.shape[0], 8, 8, 512).transpose(1, 3)
        return tF.log_softmax(x, dim=1)


def test_radar_gat_parity(rng):
    tmodel = _TorchGAT().eval()
    x = rng.normal(size=(2, 81, 5)).astype(np.float32)
    adj = rng.normal(size=(2, 81, 81)).astype(np.float32)
    with torch.no_grad():
        want = _np(tmodel(torch.from_numpy(x), torch.from_numpy(adj)))

    params = {}
    convert_radar_gat(_sd(tmodel), "", "g", params)
    fmodel = RadarGAT(dropout=0.0, precision=HI)
    got = np.asarray(fmodel.apply({"params": params["g"]},
                                  jnp.asarray(x), jnp.asarray(adj), False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-4)


def test_load_imagenet_backbones_graft(tmp_path):
    """Torchvision-format resnet .pth files graft into the image/map
    encoders; the lidar encoder keeps its 2-channel conv1 (the reference
    re-makes it, model_img.py:58-62)."""
    import torch
    from mmfn_tpu.config import GlobalConfig
    from mmfn_tpu.data.synthetic import synthetic_batch
    from mmfn_tpu.models import build_model
    from mmfn_tpu.train import create_train_state
    from mmfn_tpu.utils.weights import load_imagenet_backbones

    def fake_resnet_sd(stage_sizes):
        g = torch.Generator().manual_seed(0)
        sd = {"conv1.weight": torch.randn(64, 3, 7, 7, generator=g),
              "fc.weight": torch.randn(1000, 512, generator=g),
              "fc.bias": torch.randn(1000, generator=g)}
        widths = (64, 128, 256, 512)
        for i, blocks in enumerate(stage_sizes):
            w, w_in = widths[i], widths[max(i - 1, 0)]
            for j in range(blocks):
                pre = f"layer{i + 1}.{j}"
                cin = w_in if j == 0 else w
                sd[f"{pre}.conv1.weight"] = torch.randn(w, cin, 3, 3, generator=g)
                sd[f"{pre}.conv2.weight"] = torch.randn(w, w, 3, 3, generator=g)
                for b in ("bn1", "bn2"):
                    sd[f"{pre}.{b}.weight"] = torch.randn(w, generator=g)
                    sd[f"{pre}.{b}.bias"] = torch.randn(w, generator=g)
                    sd[f"{pre}.{b}.running_mean"] = torch.randn(w, generator=g)
                    sd[f"{pre}.{b}.running_var"] = torch.rand(w, generator=g) + 0.5
                if j == 0 and i > 0:
                    sd[f"{pre}.downsample.0.weight"] = torch.randn(w, cin, 1, 1, generator=g)
                    for s in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pre}.downsample.1.{s}"] = torch.randn(w, generator=g)
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{s}"] = torch.randn(64, generator=g)
        return sd

    p34 = tmp_path / "resnet34.pth"
    p18 = tmp_path / "resnet18.pth"
    torch.save(fake_resnet_sd((3, 4, 6, 3)), p34)
    torch.save(fake_resnet_sd((2, 2, 2, 2)), p18)

    cfg = GlobalConfig(n_layer=1, max_lanes=8)
    model = build_model(cfg, "img")   # full map-image stream owns conv1
    batch = synthetic_batch(batch_size=1, max_lanes=8, resolution=64)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    params0 = jax.tree.map(np.asarray, dict(state.params))
    stats0 = jax.tree.map(np.asarray, dict(state.batch_stats))

    params, stats = load_imagenet_backbones(
        params0, stats0, resnet34_path=str(p34), resnet18_path=str(p18))

    sd34 = torch.load(p34, weights_only=True)
    want = sd34["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(params["encoder"]["image_encoder"]["conv1"]["kernel"], want)
    np.testing.assert_allclose(params["encoder"]["img_map_encoder"]["conv1"]["kernel"], want)
    # lidar conv1 untouched (2-channel remake), deeper layers grafted
    np.testing.assert_allclose(params["encoder"]["lidar_encoder"]["conv1"]["kernel"],
                               params0["encoder"]["lidar_encoder"]["conv1"]["kernel"])
    sd18 = torch.load(p18, weights_only=True)
    np.testing.assert_allclose(
        params["encoder"]["lidar_encoder"]["layer2_0"]["conv1"]["kernel"],
        sd18["layer2.0.conv1.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(stats["encoder"]["image_encoder"]["bn1"]["mean"],
                               sd34["bn1.running_mean"].numpy())
    # untouched trees unaffected
    np.testing.assert_allclose(params["join_fc1"]["kernel"],
                               params0["join_fc1"]["kernel"])
