"""Torch-checkpoint conversion.

Converts reference PyTorch checkpoints (``best_model.pth`` saved by
phase2_train_net.py:208, or torchvision ResNet ImageNet weights) into this
framework's flax variable trees. The input is a flat ``name -> ndarray``
state_dict (load with ``torch.load(..., map_location='cpu')`` and call
``{k: v.numpy() for k, v in sd.items()}``) so torch is only needed by the
caller, never by the framework.

Layout rules:
- torch Conv2d weight (O, I, kh, kw)  -> flax Conv kernel (kh, kw, I, O)
- torch Linear weight (out, in)       -> flax Dense kernel (in, out)
- torch BatchNorm weight/bias         -> flax BatchNorm scale/bias;
  running_mean/var -> the 'batch_stats' collection
- torch GRUCell weight_ih (3H, in)    -> ours (in, 3H); biases unchanged
- DDP checkpoints may carry a 'module.' prefix — stripped, mirroring the
  reference agents (mmfn_imgnet.py DDP-prefix strip).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
Tree = Dict[str, dict]


def _conv(w: Array) -> Array:
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w: Array) -> Array:
    return np.transpose(w, (1, 0))


def strip_ddp_prefix(sd: Mapping[str, Array]) -> Dict[str, Array]:
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}


def _set(tree: Tree, path: str, value: Array) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def _bn(params: Tree, stats: Tree, dst: str, sd: Mapping[str, Array], src: str) -> None:
    _set(params, f"{dst}/scale", sd[f"{src}.weight"])
    _set(params, f"{dst}/bias", sd[f"{src}.bias"])
    _set(stats, f"{dst}/mean", sd[f"{src}.running_mean"])
    _set(stats, f"{dst}/var", sd[f"{src}.running_var"])


def _dense(params: Tree, dst: str, sd: Mapping[str, Array], src: str, bias: bool = True) -> None:
    _set(params, f"{dst}/kernel", _linear(sd[f"{src}.weight"]))
    if bias and f"{src}.bias" in sd:
        _set(params, f"{dst}/bias", sd[f"{src}.bias"])


def _layernorm(params: Tree, dst: str, sd: Mapping[str, Array], src: str) -> None:
    _set(params, f"{dst}/scale", sd[f"{src}.weight"])
    _set(params, f"{dst}/bias", sd[f"{src}.bias"])


# --------------------------------------------------------------------------- #
# ResNet
# --------------------------------------------------------------------------- #

def convert_resnet(sd: Mapping[str, Array], stage_sizes: Tuple[int, ...],
                   prefix: str = "", dst_prefix: str = "") -> Tuple[Tree, Tree]:
    """Convert a torchvision-style (Basic-block) ResNet state_dict.

    ``prefix``: key prefix in the source dict (e.g. 'encoder.image_encoder.features.').
    ``dst_prefix``: slash path prefix in the destination tree.
    Returns (params, batch_stats) subtree dicts.
    """
    params: Tree = {}
    stats: Tree = {}
    p, d = prefix, (dst_prefix + "/") if dst_prefix else ""
    _set(params, f"{d}conv1/kernel", _conv(sd[f"{p}conv1.weight"]))
    _bn(params, stats, f"{d}bn1", sd, f"{p}bn1")
    for i, blocks in enumerate(stage_sizes):
        for j in range(blocks):
            src = f"{p}layer{i + 1}.{j}"
            dst = f"{d}layer{i + 1}_{j}"
            _set(params, f"{dst}/conv1/kernel", _conv(sd[f"{src}.conv1.weight"]))
            _bn(params, stats, f"{dst}/bn1", sd, f"{src}.bn1")
            _set(params, f"{dst}/conv2/kernel", _conv(sd[f"{src}.conv2.weight"]))
            _bn(params, stats, f"{dst}/bn2", sd, f"{src}.bn2")
            if f"{src}.downsample.0.weight" in sd:
                _set(params, f"{dst}/downsample_conv/kernel", _conv(sd[f"{src}.downsample.0.weight"]))
                _bn(params, stats, f"{dst}/downsample_bn", sd, f"{src}.downsample.1")
    return params, stats


# --------------------------------------------------------------------------- #
# Fusion transformer / decoder / vectornet / GAT pieces
# --------------------------------------------------------------------------- #

def convert_fusion_transformer(sd: Mapping[str, Array], n_layer: int,
                               prefix: str, dst_prefix: str,
                               params: Tree) -> None:
    p, d = prefix, dst_prefix
    _set(params, f"{d}/pos_emb", sd[f"{p}pos_emb"])
    _dense(params, f"{d}/vel_emb", sd, f"{p}vel_emb")
    for i in range(n_layer):
        b, db = f"{p}blocks.{i}", f"{d}/block_{i}"
        _layernorm(params, f"{db}/ln1", sd, f"{b}.ln1")
        _layernorm(params, f"{db}/ln2", sd, f"{b}.ln2")
        for proj in ("key", "query", "value", "proj"):
            _dense(params, f"{db}/attn/{proj}", sd, f"{b}.attn.{proj}")
        _dense(params, f"{db}/fc1", sd, f"{b}.mlp.0")
        _dense(params, f"{db}/fc2", sd, f"{b}.mlp.2")
    _layernorm(params, f"{d}/ln_f", sd, f"{p}ln_f")


def convert_vectornet(sd: Mapping[str, Array], prefix: str, dst_prefix: str,
                      params: Tree, subgraph_layers: int = 3) -> None:
    p, d = prefix, dst_prefix
    for i in range(subgraph_layers):
        _dense(params, f"{d}/lane_subgraph/mlp_{i}/Dense_0", sd, f"{p}lane_subgraph.layers.mlp_{i}.mlp.0")
        _layernorm(params, f"{d}/lane_subgraph/mlp_{i}/LayerNorm_0", sd, f"{p}lane_subgraph.layers.mlp_{i}.mlp.1")
    _dense(params, f"{d}/pos_fc1", sd, f"{p}pos_emb.0")
    _layernorm(params, f"{d}/pos_ln", sd, f"{p}pos_emb.1")
    _dense(params, f"{d}/pos_fc2", sd, f"{p}pos_emb.3")
    _dense(params, f"{d}/L2L/to_qkv", sd, f"{p}L2L.to_qkv", bias=False)
    _dense(params, f"{d}/L2L/to_out", sd, f"{p}L2L.to_out.0")
    _dense(params, f"{d}/fuse_fc1", sd, f"{p}agent_fusion.0")
    _layernorm(params, f"{d}/fuse_ln", sd, f"{p}agent_fusion.1")
    _dense(params, f"{d}/fuse_fc2", sd, f"{p}agent_fusion.3")
    _dense(params, f"{d}/gen_fc1", sd, f"{p}generator.0")
    _layernorm(params, f"{d}/gen_ln", sd, f"{p}generator.1")
    _dense(params, f"{d}/gen_fc2", sd, f"{p}generator.3")


def convert_radar_gat(sd: Mapping[str, Array], prefix: str, dst_prefix: str,
                      params: Tree, nheads: int = 2) -> None:
    p, d = prefix, dst_prefix
    for i in range(nheads):
        _set(params, f"{d}/attention_{i}/W", sd[f"{p}attention_{i}.W"])
        _set(params, f"{d}/attention_{i}/a", sd[f"{p}attention_{i}.a"])
    _dense(params, f"{d}/mlp_1", sd, f"{p}mlp_1.0")
    _dense(params, f"{d}/mlp_2", sd, f"{p}mlp_2.0")


# --------------------------------------------------------------------------- #
# Full MMFN checkpoint
# --------------------------------------------------------------------------- #

def convert_mmfn(sd: Mapping[str, Array], variant: str, n_layer: int = 8) -> Dict[str, Tree]:
    """Reference MMFN state_dict -> {'params': ..., 'batch_stats': ...}."""
    sd = strip_ddp_prefix(dict(sd))
    params: Tree = {}
    stats: Tree = {}

    def merge(sub_params: Tree, sub_stats: Tree, key: str) -> None:
        params.setdefault("encoder", {})[key] = sub_params
        stats.setdefault("encoder", {})[key] = sub_stats

    r34, r18 = (3, 4, 6, 3), (2, 2, 2, 2)
    pp, st = convert_resnet(sd, r34, "encoder.image_encoder.features.")
    merge(pp, st, "image_encoder")
    # vec/rad variants never run the map ResNet's stem/layer1, and torch saves
    # their (unused) params anyway; convert whatever is present.
    pp, st = convert_resnet(sd, r34, "encoder.img_map_encoder.features.")
    merge(pp, st, "img_map_encoder")
    pp, st = convert_resnet(sd, r18, "encoder.lidar_encoder._model.")
    merge(pp, st, "lidar_encoder")

    enc = params["encoder"]
    for k in range(1, 5):
        enc[f"transformer{k}"] = {}
        convert_fusion_transformer(sd, n_layer, f"encoder.transformer{k}.",
                                   f"transformer{k}", enc)
    if variant in ("vec", "rad"):
        enc["vectornet_encoder"] = {}
        convert_vectornet(sd, "encoder.vectornet_encoder.", "vectornet_encoder", enc)
    if variant == "rad":
        enc["radar_encoder"] = {}
        convert_radar_gat(sd, "encoder.radar_encoder.", "radar_encoder", enc)

    for idx, torch_idx in ((1, 0), (2, 2), (3, 4)):
        _dense(params, f"join_fc{idx}", sd, f"join.{torch_idx}")
    gru = params.setdefault("decoder", {}).setdefault("decoder", {})
    gru["weight_ih"] = _linear(sd["decoder.weight_ih"])
    gru["weight_hh"] = _linear(sd["decoder.weight_hh"])
    gru["bias_ih"] = np.asarray(sd["decoder.bias_ih"])
    gru["bias_hh"] = np.asarray(sd["decoder.bias_hh"])
    _dense(params, "decoder/output", sd, "output")

    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------- #
# Baseline checkpoints (team_code/benchmarks/{aim,cilrs,transfuser}/model.py)
# --------------------------------------------------------------------------- #

def _convert_waypoint_decoder(params: Tree, sd: Mapping[str, Array]) -> None:
    """GRUCell 'decoder' + Linear 'output' -> our WaypointDecoder subtree."""
    gru = params.setdefault("decoder", {}).setdefault("decoder", {})
    gru["weight_ih"] = _linear(sd["decoder.weight_ih"])
    gru["weight_hh"] = _linear(sd["decoder.weight_hh"])
    gru["bias_ih"] = np.asarray(sd["decoder.bias_ih"])
    gru["bias_hh"] = np.asarray(sd["decoder.bias_hh"])
    _dense(params, "decoder/output", sd, "output")


def _convert_join(params: Tree, sd: Mapping[str, Array], prefix: str = "") -> None:
    for idx, torch_idx in ((1, 0), (2, 2), (3, 4)):
        _dense(params, f"join_fc{idx}", sd, f"{prefix}join.{torch_idx}")


def convert_aim(sd: Mapping[str, Array]) -> Dict[str, Tree]:
    """Reference AIM state_dict (aim/model.py:68) -> flax variables."""
    sd = strip_ddp_prefix(dict(sd))
    params: Tree = {}
    stats: Tree = {}
    p, s = convert_resnet(sd, (3, 4, 6, 3), "image_encoder.features.")
    params["image_encoder"], stats["image_encoder"] = p, s
    _convert_join(params, sd)
    _convert_waypoint_decoder(params, sd)
    return {"params": params, "batch_stats": stats}


def convert_cilrs(sd: Mapping[str, Array], num_branch: int = 6) -> Dict[str, Tree]:
    """Reference CILRS state_dict (cilrs/model.py:108) -> flax variables.

    Backbone is ResNet18 (cilrs/model.py:17); heads live under 'controller.'.
    """
    sd = strip_ddp_prefix(dict(sd))
    params: Tree = {}
    stats: Tree = {}
    p, s = convert_resnet(sd, (2, 2, 2, 2), "encoder.features.")
    params["image_encoder"], stats["image_encoder"] = p, s
    _dense(params, "vel_in_fc1", sd, "controller.vel_in.0")
    _dense(params, "vel_in_fc2", sd, "controller.vel_in.2")
    _dense(params, "vel_out_fc1", sd, "controller.vel_out.0")
    _dense(params, "vel_out_fc2", sd, "controller.vel_out.2")
    _dense(params, "vel_out_fc3", sd, "controller.vel_out.4")
    for i in range(num_branch):
        for j, torch_idx in ((1, 0), (2, 2), (3, 4)):
            _dense(params, f"branch_{i}_fc{j}", sd,
                   f"controller.branches.{i}.{torch_idx}")
    return {"params": params, "batch_stats": stats}


def convert_transfuser(sd: Mapping[str, Array], n_layer: int = 8) -> Dict[str, Tree]:
    """Reference TransFuser state_dict (transfuser/model.py:413) -> flax."""
    sd = strip_ddp_prefix(dict(sd))
    params: Tree = {}
    stats: Tree = {}
    p, s = convert_resnet(sd, (3, 4, 6, 3), "encoder.image_encoder.features.")
    params["image_encoder"], stats["image_encoder"] = p, s
    p, s = convert_resnet(sd, (2, 2, 2, 2), "encoder.lidar_encoder._model.")
    params["lidar_encoder"], stats["lidar_encoder"] = p, s
    for k in range(1, 5):
        convert_fusion_transformer(sd, n_layer, f"encoder.transformer{k}.",
                                   f"transformer{k}", params)
    _convert_join(params, sd)
    _convert_waypoint_decoder(params, sd)
    return {"params": params, "batch_stats": stats}


CONVERTERS = {
    "img": lambda sd, n_layer=8: convert_mmfn(sd, "img", n_layer),
    "vec": lambda sd, n_layer=8: convert_mmfn(sd, "vec", n_layer),
    "rad": lambda sd, n_layer=8: convert_mmfn(sd, "rad", n_layer),
    "aim": lambda sd, n_layer=8: convert_aim(sd),
    "cilrs": lambda sd, n_layer=8: convert_cilrs(sd),
    "transfuser": lambda sd, n_layer=8: convert_transfuser(sd, n_layer),
}


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a .pth checkpoint into numpy (requires torch at call time)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def load_imagenet_backbones(params: Tree, batch_stats: Tree,
                            resnet34_path: str = None,
                            resnet18_path: str = None) -> Tuple[Tree, Tree]:
    """Graft torchvision ImageNet weights into the model's ResNet encoders.

    The reference constructs its image/map encoders from
    ``models.resnet34(pretrained=True)`` and the lidar encoder from
    ``models.resnet18(pretrained=True)`` with a freshly initialized 2-channel
    conv1 (model_img.py:22,58-62). Given raw torchvision ``.pth`` state
    dicts (e.g. resnet34-b627a593.pth), this grafts:

    - resnet34 -> every ``image_encoder`` / ``img_map_encoder`` subtree
      present in ``params``;
    - resnet18 -> ``lidar_encoder``, skipping conv1 (2-channel input keeps
      its random init, exactly like the reference's re-made conv).

    Returns new (params, batch_stats) trees; input trees are not mutated.
    """
    import copy

    params = copy.deepcopy(dict(params))
    batch_stats = copy.deepcopy(dict(batch_stats))

    def walk(tree, name):
        """Yield every dict in `tree` holding a key `name` (the encoders sit
        at the top level in the baselines but under 'encoder' in MMFN)."""
        if not isinstance(tree, dict):
            return
        if name in tree:
            yield tree
        for v in tree.values():
            yield from walk(v, name)

    def merge_existing(dst, src):
        """Overwrite only leaves the model actually owns: e.g. the vec
        variant's map stream runs layer2-4 only (VectorNet seeds it), so its
        img_map_encoder subtree has no conv1/bn1/layer1 — grafting extra keys
        would desync params from the optimizer state's tree structure."""
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(dst[k], dict) and isinstance(v, dict):
                merge_existing(dst[k], v)
            else:
                dst[k] = np.asarray(v)

    def graft(name, sd, stage_sizes, skip_conv1=False):
        p, s = convert_resnet(sd, stage_sizes)
        if skip_conv1:
            p.pop("conv1", None)
        for holder in walk(params, name):
            merge_existing(holder[name], p)
        if s:
            for holder in walk(batch_stats, name):
                merge_existing(holder[name], s)

    if resnet34_path:
        sd34 = load_torch_state_dict(resnet34_path)
        graft("image_encoder", sd34, (3, 4, 6, 3))
        graft("img_map_encoder", sd34, (3, 4, 6, 3))
    if resnet18_path:
        sd18 = load_torch_state_dict(resnet18_path)
        graft("lidar_encoder", sd18, (2, 2, 2, 2), skip_conv1=True)
    return params, batch_stats
