"""Benchmark baseline models (team_code/benchmarks/): AIM, CILRS, TransFuser.

Strict subsets of the MMFN layer zoo, so they share the ResNet backbones,
fusion transformer, and waypoint decoder:
- AIM (aim/model.py:68-120): image-only ResNet34 -> join MLP -> GRU decoder
  with concatenated target point.
- CILRS (cilrs/model.py:40-135): ResNet18 + velocity-in projection, 6
  command-selected control branches (sigmoid outputs mapped to controls),
  and a velocity prediction head.
- TransFuser (transfuser/model.py): image + LiDAR BEV streams fused by 4
  interleaved 2-group transformers -> GRU decoder (x + target input).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.batch import Batch
from mmfn_tpu.models.common import (
    join_mlp as _join_mlp, resolve_precision, torch_linear_kernel_init,
    torch_linear_bias_init)
from mmfn_tpu.models.decoder import WaypointDecoder
from mmfn_tpu.models.gpt import FusionTransformer
from mmfn_tpu.models.resnet import resnet18, resnet34
from mmfn_tpu.ops.image import normalize_imagenet
from mmfn_tpu.ops.pool import adaptive_avg_pool
from mmfn_tpu.ops.resize import resize_bilinear_align_corners


class AIM(nn.Module):
    config: GlobalConfig
    variant: str = "aim"

    def setup(self):
        precision = resolve_precision(self.config.matmul_precision)
        self.image_encoder = resnet34(precision, name="image_encoder")
        self.join_fc1, self.join_fc2, self.join_fc3 = _join_mlp(precision)
        self.decoder = WaypointDecoder(pred_len=self.config.pred_len,
                                       input_mode="cat", precision=precision)

    def __call__(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        feat = self.image_encoder(normalize_imagenet(batch.image), train)
        z = nn.relu(self.join_fc1(feat))
        z = nn.relu(self.join_fc2(z))
        z = nn.relu(self.join_fc3(z))
        return self.decoder(z, batch.target_point)


class CILRS(nn.Module):
    config: GlobalConfig
    num_branch: int = 6
    hidden_size: int = 256
    variant: str = "cilrs"

    def setup(self):
        precision = resolve_precision(self.config.matmul_precision)
        self.precision = precision
        # the reference CILRS backbone is ResNet18, not 34 (cilrs/model.py:17)
        self.image_encoder = resnet18(precision, name="image_encoder")
        kw = dict(kernel_init=torch_linear_kernel_init, precision=precision)
        h, c = self.hidden_size, 512
        self.vel_in_fc1 = nn.Dense(h, bias_init=torch_linear_bias_init(1), **kw)
        self.vel_in_fc2 = nn.Dense(c, bias_init=torch_linear_bias_init(h), **kw)
        self.vel_out_fc1 = nn.Dense(h, bias_init=torch_linear_bias_init(c), **kw)
        self.vel_out_fc2 = nn.Dense(h, bias_init=torch_linear_bias_init(h), **kw)
        self.vel_out_fc3 = nn.Dense(1, bias_init=torch_linear_bias_init(h), **kw)
        self.branches = tuple(
            tuple([nn.Dense(h, bias_init=torch_linear_bias_init(c),
                            name=f"branch_{i}_fc1", **kw),
                   nn.Dense(h, bias_init=torch_linear_bias_init(h),
                            name=f"branch_{i}_fc2", **kw),
                   nn.Dense(3, bias_init=torch_linear_bias_init(h),
                            name=f"branch_{i}_fc3", **kw)])
            for i in range(self.num_branch))

    def __call__(self, batch: Batch, command: jnp.ndarray, train: bool = False):
        """command: (B,) int navigational command (1-based; 0 ignored).

        Returns (steer, throttle, brake, velocity_pred)."""
        c = self.image_encoder(normalize_imagenet(batch.image), train)
        vel = batch.velocity[:, None].astype(c.dtype)
        encoding = c + self.vel_in_fc2(nn.relu(self.vel_in_fc1(vel)))

        control = 0.0
        for i, (fc1, fc2, fc3) in enumerate(self.branches):
            pred = nn.sigmoid(fc3(nn.relu(fc2(nn.relu(fc1(encoding))))))
            mask = (command == i + 1).astype(pred.dtype)[:, None]
            control = control + pred * mask

        # the reference computes vel_out(c) AFTER `encoding += vel_in(...)`,
        # and torch's in-place += mutates the aliased `c` — so the velocity
        # head really consumes the velocity-augmented encoding
        # (benchmarks/cilrs/model.py:92-95,104)
        velocity_pred = self.vel_out_fc3(nn.relu(self.vel_out_fc2(
            nn.relu(self.vel_out_fc1(encoding)))))
        steer = control[:, 0] * 2.0 - 1.0
        throttle = control[:, 1] * self.config.max_throttle
        brake = control[:, 2]
        return steer, throttle, brake, velocity_pred


class TransFuser(nn.Module):
    config: GlobalConfig
    variant: str = "transfuser"

    def setup(self):
        cfg = self.config
        precision = resolve_precision(cfg.matmul_precision)
        self.image_encoder = resnet34(precision, name="image_encoder")
        self.lidar_encoder = resnet18(precision, name="lidar_encoder")
        self.transformers = tuple(
            FusionTransformer(
                n_embd=e, n_head=cfg.n_head, block_exp=cfg.block_exp,
                n_layer=cfg.n_layer, n_groups=cfg.n_views + 1,
                vert_anchors=cfg.vert_anchors, horz_anchors=cfg.horz_anchors,
                seq_len=cfg.seq_len, embd_pdrop=cfg.embd_pdrop,
                attn_pdrop=cfg.attn_pdrop, resid_pdrop=cfg.resid_pdrop,
                precision=precision, attn_impl=cfg.attn_impl,
                name=f"transformer{i + 1}")
            for i, e in enumerate((64, 128, 256, 512)))
        self.join_fc1, self.join_fc2, self.join_fc3 = _join_mlp(precision)
        self.decoder = WaypointDecoder(pred_len=cfg.pred_len, input_mode="add",
                                       precision=precision)

    def __call__(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        anchors = (cfg.vert_anchors, cfg.horz_anchors)
        image_f = self.image_encoder.stage(
            self.image_encoder.stem(normalize_imagenet(batch.image), train), 1, train)
        lidar_f = self.lidar_encoder.stage(
            self.lidar_encoder.stem(batch.lidar_bev, train), 1, train)

        for i in range(4):
            fused = self.transformers[i](
                [adaptive_avg_pool(image_f, anchors), adaptive_avg_pool(lidar_f, anchors)],
                batch.velocity, train)
            image_f = image_f + resize_bilinear_align_corners(fused[0], image_f.shape[1:3])
            lidar_f = lidar_f + resize_bilinear_align_corners(fused[1], lidar_f.shape[1:3])
            if i < 3:
                image_f = self.image_encoder.stage(image_f, i + 2, train)
                lidar_f = self.lidar_encoder.stage(lidar_f, i + 2, train)

        fused = image_f.mean(axis=(1, 2)) + lidar_f.mean(axis=(1, 2))
        z = nn.relu(self.join_fc1(fused))
        z = nn.relu(self.join_fc2(z))
        z = nn.relu(self.join_fc3(z))
        return self.decoder(z, batch.target_point)
