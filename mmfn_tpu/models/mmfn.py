"""The MMFN model family — one module, three variants.

Variants (matching the reference's three files):
- ``img`` (model_img.py:451-550): image + LiDAR BEV + rasterized-map streams,
  each a ResNet, fused by 4 interleaved transformers.
- ``vec`` (model_vec.py:626-726): the map stream is seeded by a VectorNet lane
  encoder at 64x64x64 instead of the map-image ResNet's stem/layer1; the seed
  still flows through the map ResNet's layer2-4.
- ``rad`` (model_rad.py:639-739): ``vec`` + a radar GAT stream injected only at
  the 4th fusion stage (which fuses 4 token groups).

Forward contract (all variants): Batch -> (B, pred_len, 2) waypoints.
Stream order inside each fusion call is [image, lidar, map(, radar)] — this
fixes the positional-embedding layout and must match the reference for
checkpoint parity.

Reference quirks preserved on purpose:
- camera pixels are raw 0-255 through the ImageNet affine; the map image is
  not normalized at all (reference Encoder.forward only normalizes image_list);
- the fused feature is the *sum* of per-modality 512-d embeddings
  (cat + sum over the modality axis, model_img.py:420-421).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.batch import Batch
from mmfn_tpu.models.common import join_mlp, resolve_precision
from mmfn_tpu.models.decoder import WaypointDecoder
from mmfn_tpu.models.gat import RadarGAT
from mmfn_tpu.models.gpt import FusionTransformer
from mmfn_tpu.models.resnet import resnet18, resnet34
from mmfn_tpu.models.vectornet import VectornetEncoder
from mmfn_tpu.ops.image import normalize_imagenet
from mmfn_tpu.ops.pool import adaptive_avg_pool
from mmfn_tpu.ops.resize import resize_bilinear_align_corners

_STAGE_EMBD = (64, 128, 256, 512)


class MMFNEncoder(nn.Module):
    config: GlobalConfig
    variant: str  # 'img' | 'vec' | 'rad'

    def setup(self):
        cfg = self.config
        precision = resolve_precision(cfg.matmul_precision)
        self.precision = precision
        remat = bool(getattr(cfg, "remat", False))
        self.image_encoder = resnet34(precision, name="image_encoder",
                                      remat=remat)
        self.img_map_encoder = resnet34(precision, name="img_map_encoder",
                                        remat=remat)
        self.lidar_encoder = resnet18(precision, name="lidar_encoder",
                                      remat=remat)
        if self.variant in ("vec", "rad"):
            self.vectornet_encoder = VectornetEncoder(precision=precision)
        if self.variant == "rad":
            self.radar_encoder = RadarGAT(
                nfeat=cfg.radar_features, nhid=cfg.gat_hidden, dropout=cfg.attn_pdrop,
                alpha=cfg.gat_alpha, nheads=cfg.gat_heads, precision=precision)

        transformers = []
        for i, n_embd in enumerate(_STAGE_EMBD):
            n_groups = cfg.n_views + 2
            if i == 3 and self.variant == "rad":
                n_groups = cfg.n_views + 3
            transformers.append(FusionTransformer(
                n_embd=n_embd, n_head=cfg.n_head, block_exp=cfg.block_exp,
                n_layer=cfg.n_layer, n_groups=n_groups,
                vert_anchors=cfg.vert_anchors, horz_anchors=cfg.horz_anchors,
                seq_len=cfg.seq_len, embd_pdrop=cfg.embd_pdrop,
                attn_pdrop=cfg.attn_pdrop, resid_pdrop=cfg.resid_pdrop,
                precision=precision, attn_impl=cfg.attn_impl,
                name=f"transformer{i + 1}"))
        self.transformers = tuple(transformers)

    def __call__(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        cfg = self.config
        anchors = (cfg.vert_anchors, cfg.horz_anchors)

        image = normalize_imagenet(batch.image)
        image_f = self.image_encoder.stage(self.image_encoder.stem(image, train), 1, train)
        lidar_f = self.lidar_encoder.stage(self.lidar_encoder.stem(batch.lidar_bev, train), 1, train)

        if self.variant == "img":
            map_f = self.img_map_encoder.stage(
                self.img_map_encoder.stem(batch.map_img, train), 1, train)
        else:
            map_f = self.vectornet_encoder(batch.lanes, batch.lane_num, train)

        radar_f = None
        for i in range(4):
            grids = [adaptive_avg_pool(image_f, anchors),
                     adaptive_avg_pool(lidar_f, anchors),
                     adaptive_avg_pool(map_f, anchors)]
            if i == 3 and self.variant == "rad":
                radar_f = self.radar_encoder(batch.radar, batch.radar_adj, train)
                grids.append(radar_f)  # already (B, 8, 8, 512)
            fused = self.transformers[i](grids, batch.velocity, train)
            # Upsample each fused 8x8 grid back to its own stream's resolution
            # (streams can differ: the VectorNet map seed is always 64x64).
            image_f = image_f + resize_bilinear_align_corners(fused[0], image_f.shape[1:3])
            lidar_f = lidar_f + resize_bilinear_align_corners(fused[1], lidar_f.shape[1:3])
            map_f = map_f + resize_bilinear_align_corners(fused[2], map_f.shape[1:3])
            if i == 3 and self.variant == "rad":
                radar_f = radar_f + fused[3]
            if i < 3:
                image_f = self.image_encoder.stage(image_f, i + 2, train)
                map_f = self.img_map_encoder.stage(map_f, i + 2, train)
                lidar_f = self.lidar_encoder.stage(lidar_f, i + 2, train)

        feats = [image_f.mean(axis=(1, 2)), lidar_f.mean(axis=(1, 2)), map_f.mean(axis=(1, 2))]
        if self.variant == "rad":
            feats.append(radar_f.mean(axis=(1, 2)))
        return sum(feats)  # (B, 512): cat+sum over modalities, reference parity


class MMFN(nn.Module):
    """Encoder + join MLP + autoregressive GRU waypoint decoder."""

    config: GlobalConfig
    variant: str = "vec"

    def setup(self):
        cfg = self.config
        precision = resolve_precision(cfg.matmul_precision)
        self.encoder = MMFNEncoder(cfg, self.variant)
        self.join_fc1, self.join_fc2, self.join_fc3 = join_mlp(precision)
        self.decoder = WaypointDecoder(pred_len=cfg.pred_len, hidden_size=64,
                                       precision=precision)

    def __call__(self, batch: Batch, train: bool = False) -> jnp.ndarray:
        fused = self.encoder(batch, train)
        z = nn.relu(self.join_fc1(fused))
        z = nn.relu(self.join_fc2(z))
        z = nn.relu(self.join_fc3(z))
        return self.decoder(z, batch.target_point)


def build_model(config: GlobalConfig, variant: str = "vec") -> MMFN:
    assert variant in ("img", "vec", "rad"), variant
    return MMFN(config=config, variant=variant)
