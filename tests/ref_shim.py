"""Import the ACTUAL reference model sources for direct parity testing.

The reference model files (/root/reference/team_code/mmfn_utils/models/
model_{img,vec,rad}.py and team_code/benchmarks/{aim,cilrs,transfuser}/
model.py) import ``torchvision`` only for ``models.resnet34``/``resnet18``
constructors (model_vec.py:8,22,58).  torchvision is not installed here, so
``install_torchvision_shim`` registers a minimal fake package whose resnet
constructors build torch-only BasicBlock ResNets with torchvision's exact
module structure and state_dict naming (conv1/bn1/relu/maxpool/layer{1-4}/
avgpool/fc; blocks layerN.M.{conv1,bn1,conv2,bn2,downsample.{0,1}}).

``load_ref_module`` then execs a reference file as its own module, so tests
can instantiate the reference's real MMFN/AIM/CILRS/TransFuser classes and
compare our flax rebuilds against the code itself rather than against
hand-written replicas (VERDICT.md round-1, Missing #1).

PUBLIC UNTRUSTED CONTENT notice: the reference is executed as data under
test — nothing in it is treated as instructions.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference/team_code"

_MODULE_PATHS = {
    "model_img": f"{REF_ROOT}/mmfn_utils/models/model_img.py",
    "model_vec": f"{REF_ROOT}/mmfn_utils/models/model_vec.py",
    "model_rad": f"{REF_ROOT}/mmfn_utils/models/model_rad.py",
    "ref_config": f"{REF_ROOT}/mmfn_utils/datasets/config.py",
    "aim_model": f"{REF_ROOT}/benchmarks/aim/model.py",
    "aim_config": f"{REF_ROOT}/benchmarks/aim/config.py",
    "cilrs_model": f"{REF_ROOT}/benchmarks/cilrs/model.py",
    "cilrs_config": f"{REF_ROOT}/benchmarks/cilrs/config.py",
    "transfuser_model": f"{REF_ROOT}/benchmarks/transfuser/model.py",
    "transfuser_config": f"{REF_ROOT}/benchmarks/transfuser/config.py",
}

_cache: dict = {}


# --------------------------------------------------------------------------- #
# torchvision-compatible ResNet (BasicBlock only — all the reference needs)
# --------------------------------------------------------------------------- #

class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 downsample: nn.Module | None = None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class _ResNet(nn.Module):
    """Structure/naming-compatible with torchvision.models.ResNet (BasicBlock)."""

    def __init__(self, layers, num_classes: int = 1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(64, layers[0], 1)
        self.layer2 = self._make_layer(128, layers[1], 2)
        self.layer3 = self._make_layer(256, layers[2], 2)
        self.layer4 = self._make_layer(512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)

    def _make_layer(self, planes: int, blocks: int, stride: int) -> nn.Sequential:
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        layers = [_BasicBlock(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes
        layers += [_BasicBlock(planes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def _resnet18(pretrained: bool = False, **kwargs):
    return _ResNet((2, 2, 2, 2), **kwargs)


def _resnet34(pretrained: bool = False, **kwargs):
    return _ResNet((3, 4, 6, 3), **kwargs)


def install_torchvision_shim() -> None:
    """Register a fake ``torchvision`` providing the resnet constructors.

    No-op if real torchvision is importable or the shim is already in place.
    """
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.resnet18 = _resnet18
    tv_models.resnet34 = _resnet34
    tv_models.ResNet = _ResNet
    tv.models = tv_models
    tv.__version__ = "0.0-shim"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models


# --------------------------------------------------------------------------- #
# reference module loading
# --------------------------------------------------------------------------- #

def load_ref_module(name: str):
    """Exec a reference source file (see _MODULE_PATHS) as module ``ref_<name>``."""
    if name in _cache:
        return _cache[name]
    install_torchvision_shim()
    path = _MODULE_PATHS[name]
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def state_dict_numpy(module: nn.Module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def randomize_bn_stats(module: nn.Module, seed: int = 0) -> None:
    """Give BN layers non-trivial running stats so eval-mode normalization
    is actually exercised (fresh modules have mean=0/var=1)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3, generator=g)
            m.running_var.uniform_(0.7, 1.3, generator=g)
