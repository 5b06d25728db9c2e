"""ResNet backbones (torchvision BasicBlock topology), NHWC, staged execution.

The MMFN encoder interleaves fusion transformers *between* ResNet stages
(reference model_img.py:332-408), so the backbone exposes ``stem`` and
``layer1..layer4`` as separately callable methods instead of one monolithic
forward. Channel widths/blocks mirror torchvision resnet18/34 so ImageNet
weights convert 1:1 (see mmfn_tpu.utils.weights.convert_resnet).

TPU notes: convolutions are NHWC (XLA's preferred TPU layout); BatchNorm uses
flax running stats with torch-equivalent momentum (0.9 here == torch 0.1) and
eps 1e-5.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mmfn_tpu.models.common import max_pool_3x3_s2_p1

# torchvision ResNet conv init: nn.init.kaiming_normal_(mode='fan_out',
# nonlinearity='relu') — std sqrt(2/fan_out), normal (resnet.py _resnet init).
# flax's default (lecun_normal, fan_in) would train from a different
# distribution; the reference additionally starts from ImageNet weights,
# which `pretrained_resnet:` in phase2 loads when a torchvision .pth is
# available (this environment has no network egress to fetch one).
_conv_kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    use_projection: bool = False
    precision: Any = None

    def setup(self):
        kw = dict(use_bias=False, precision=self.precision,
                  kernel_init=_conv_kaiming_out)
        self.conv1 = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                             padding=((1, 1), (1, 1)), **kw)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        self.conv2 = nn.Conv(self.features, (3, 3), (1, 1), padding=((1, 1), (1, 1)), **kw)
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        if self.use_projection:
            self.downsample_conv = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                                           padding="VALID", **kw)
            self.downsample_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)

    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        out = self.bn2(self.conv2(out), use_running_average=not train)
        if self.use_projection:
            identity = self.downsample_bn(self.downsample_conv(x), use_running_average=not train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Staged ResNet. ``stage_sizes`` = (2,2,2,2) for resnet18, (3,4,6,3) for 34."""

    stage_sizes: Sequence[int]
    precision: Any = None
    # per-block activation rematerialization (nn.remat == jax.checkpoint as
    # a lifted flax transform): the backward recomputes each block's conv/BN
    # intermediates from its input instead of keeping them resident, so
    # activation HBM scales with ONE block, not the whole backbone. This is
    # what lets batch-96 training coexist with the 5.4 GiB HBM-resident data
    # cache (GlobalConfig.remat -> phase2 remat=true). Parameter names are
    # unchanged — checkpoints are interchangeable with remat off.
    remat: bool = False

    WIDTHS = (64, 128, 256, 512)

    def setup(self):
        self.conv1 = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)),
                             use_bias=False, precision=self.precision,
                             kernel_init=_conv_kaiming_out)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
        # static_argnums counts self at 0, so 2 == the `train` bool
        block_cls = (nn.remat(BasicBlock, static_argnums=(2,)) if self.remat
                     else BasicBlock)
        layers = []
        for i, (width, blocks) in enumerate(zip(self.WIDTHS, self.stage_sizes)):
            stage = []
            for j in range(blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                use_projection = j == 0 and i > 0
                stage.append(block_cls(width, strides, use_projection,
                                       precision=self.precision,
                                       name=f"layer{i + 1}_{j}"))
            layers.append(tuple(stage))
        self.layers = tuple(layers)

    # ---- staged API (used by the MMFN encoder) ----

    def stem(self, x, train: bool = False):
        x = nn.relu(self.bn1(self.conv1(x), use_running_average=not train))
        return max_pool_3x3_s2_p1(x)

    def stage(self, x, index: int, train: bool = False):
        """Run layer{index} (1-based, mirroring torchvision naming)."""
        for block in self.layers[index - 1]:
            x = block(x, train)
        return x

    def __call__(self, x, train: bool = False):
        x = self.stem(x, train)
        for i in range(1, 5):
            x = self.stage(x, i, train)
        return jnp.mean(x, axis=(1, 2))  # global avgpool -> (B, 512)


def resnet18(precision: Any = None, name: str = None,
             remat: bool = False) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), precision=precision, name=name,
                  remat=remat)


def resnet34(precision: Any = None, name: str = None,
             remat: bool = False) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), precision=precision, name=name,
                  remat=remat)
