#!/usr/bin/env python
"""phase2: train an MMFN variant on phase-1 pickles, data-parallel over the
local device mesh.

TPU rebuild of run_steps/phase2_train_net.py: AdamW lr 1e-4, mean-L1 waypoint
loss, val every N epochs, best-model checkpointing with recent.log resume —
but one jitted train step sharded across all local devices via GSPMD instead
of DDP/NCCL, and host-sharded data loading instead of DistributedSampler.
Multi-host: run one process per host after jax.distributed.initialize() —
set process_index/process_count via the environment; the loader shards by
jax.process_index() automatically.

Usage:
    python run_steps/phase2_train_net.py --config run_steps/config/train.yaml \
        [train_agent.entry_point=mmfn_vec batch_size=24 epochs=101 ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.collate import data_loader
from mmfn_tpu.data.dataset import PreprocessedDataset
from mmfn_tpu.models import get_entry_point
from mmfn_tpu.parallel import make_mesh, replicate, shard_batch
from mmfn_tpu.train import Engine, create_train_state
from mmfn_tpu.utils.cli import load_config
from mmfn_tpu.utils.logging import MetricsLogger, bcolors as bc
from mmfn_tpu.utils.compile_cache import enable_persistent_cache

# warm re-runs/resumes: full-model compiles dominate cold-start wall-clock
enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(os.path.dirname(__file__),
                                                     "config", "train.yaml"))
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, args.overrides)

    if cfg.get("multi_host"):
        # Multi-host data parallelism: one process per host; coordinator and
        # process ids come from the environment / config (the TPU-native
        # replacement for torch.distributed.launch rendezvous, README.md:168).
        jax.distributed.initialize(
            coordinator_address=cfg.get("coordinator_address"),
            num_processes=cfg.get("num_processes"),
            process_id=cfg.get("process_id"))

    model_overrides = dict(cfg.get("model", {}))
    # opt-in mixed precision (compute_dtype=bfloat16): bf16 fwd/bwd with f32
    # master params — 1.16x/step measured on v5e (train/engine.py)
    gconf = GlobalConfig(
        lr=cfg.get("lr", 1e-4), max_lanes=cfg.get("max_lanes", 64),
        compute_dtype=cfg.get("compute_dtype",
                              model_overrides.pop("compute_dtype", "float32")),
        # remat=true: per-block ResNet rematerialization (models/resnet.py) —
        # activation HBM drops to a ~one-block floor so big batches coexist
        # with the HBM-resident data cache (batch 96 OOMs without it)
        remat=cfg.get("remat", model_overrides.pop("remat", False)),
        # checkpoint_backend=orbax: async sharded checkpoints (multi-host
        # writes without a rank-0 full-state gather; train/engine.py)
        checkpoint_backend=cfg.get(
            "checkpoint_backend",
            model_overrides.pop("checkpoint_backend", "msgpack")),
        **model_overrides)
    root = cfg["data_folder"]
    name = os.path.basename(os.path.normpath(root))
    train_set = PreprocessedDataset(os.path.join(os.path.dirname(root), f"pro_train_f{name}"))
    val_set = PreprocessedDataset(os.path.join(os.path.dirname(root), f"pro_eval_f{name}"))
    print(f"{bc.OKGREEN}train frames: {len(train_set)}, val frames: {len(val_set)}{bc.ENDC}")

    entry = cfg.get("train_agent", {}).get("entry_point", "mmfn_vec")
    model = get_entry_point(entry)(gconf)
    print(f"{bc.OKCYAN}model: {entry} (variant {model.variant}){bc.ENDC}")

    logdir = cfg["logdir"]
    logger = MetricsLogger(logdir, mode=cfg.get("wandb_mode", "auto"), config=dict(cfg))
    engine = Engine(model, gconf, logdir, log_fn=logger.log)

    batch_size = int(cfg.get("batch_size", 24))
    # model_parallel: M factors the devices into a ('data','model') mesh and
    # tensor-shards the fusion transformer (Megatron layout,
    # parallel/mesh.py) — a TPU-native option beyond the reference's DDP;
    # the default 1 is pure data parallelism, bitwise the old behavior
    tp = int(cfg.get("model_parallel", 1))
    total = len(jax.devices())
    if total % max(tp, 1):
        raise SystemExit(f"model_parallel={tp} does not divide "
                         f"{total} devices")
    mesh = make_mesh(axes=("data", "model"), axis_sizes=(total // tp, tp))
    n_dev = mesh.shape["data"]
    if batch_size % n_dev:
        batch_size = (batch_size // n_dev + 1) * n_dev
        print(f"{bc.WARNING}batch_size rounded to {batch_size} for {n_dev} devices{bc.ENDC}")

    # init_torch analog (run_steps/utils.py:77-84): seed ambient RNGs too
    from mmfn_tpu.utils.seeding import seed_everything

    root_key = seed_everything(int(cfg.get("seed", 42)))
    if len(train_set) < batch_size:
        raise SystemExit(f"training pool has {len(train_set)} frames < "
                         f"batch_size {batch_size}; collect more data or "
                         f"lower batch_size")
    sample = next(data_loader(train_set, batch_size, gconf.max_lanes, num_threads=1))
    state = create_train_state(model, gconf, root_key, sample)
    # ImageNet-pretrained backbones (the reference's models.resnet*(
    # pretrained=True)): point pretrained_resnet34/18 at raw torchvision
    # .pth files to reproduce the reference's warm start
    if cfg.get("pretrained_resnet34") or cfg.get("pretrained_resnet18"):
        from mmfn_tpu.utils.weights import load_imagenet_backbones

        p, s = load_imagenet_backbones(
            jax.tree.map(np.asarray, dict(state.params)),
            jax.tree.map(np.asarray, dict(state.batch_stats)),
            resnet34_path=cfg.get("pretrained_resnet34"),
            resnet18_path=cfg.get("pretrained_resnet18"))
        state = state.replace(params=p, batch_stats=s)
        print(f"{bc.OKGREEN}grafted ImageNet backbone weights{bc.ENDC}")

    restored = engine.resume(state)
    if restored is not None:
        state = restored
        print(f"{bc.OKGREEN}resumed from epoch {engine.cur_epoch}{bc.ENDC}")
    if tp > 1:
        from mmfn_tpu.parallel import tensor_parallel_sharding

        state = tensor_parallel_sharding(state, mesh)
        print(f"{bc.OKCYAN}mesh: data={n_dev} x model={tp} "
              f"(fusion transformer tensor-sharded){bc.ENDC}")
    else:
        state = replicate(state, mesh)

    # the configured seed governs data order and dropout too, not just init
    seed = int(cfg.get("seed", 42))

    # device_data_cache (auto|true|false, default auto): upload the whole
    # dataset to HBM once in lossless transport dtypes and gather shuffled
    # batches on device — decouples epochs from disk/link bandwidth
    # (measured: the relay caps streamed training at ~130 fps vs the chip's
    # 435-490; data/device_cache.py). Auto applies on single-process,
    # single-data-shard runs that fit the HBM budget.
    from mmfn_tpu.data.device_cache import maybe_device_cache

    cached = maybe_device_cache(
        train_set, val_set, gconf, cfg.get("device_data_cache", "auto"),
        mesh_size=int(mesh.size),
        # only the img variant reads Batch.map_img — dropping the raster
        # column cuts the cache footprint ~37% for vec/rad/baselines
        need_map=getattr(model, "variant", "img") == "img",
        budget_bytes=int(float(cfg.get("device_cache_budget_gb", 8)) * 2**30))
    if cached is not None:
        train_cache, val_cache = cached
        print(f"{bc.OKCYAN}device data cache: "
              f"{(train_cache.nbytes + val_cache.nbytes) / 2 ** 30:.2f} GiB "
              f"resident in HBM; epochs run link-free{bc.ENDC}")

        def batches(split_set, shuffle):
            cache = train_cache if split_set is train_set else val_cache

            def make(epoch):
                return cache.batches(batch_size, shuffle=shuffle,
                                     seed=epoch + seed * 10007)
            return make
    else:
        def batches(split_set, shuffle):
            def make(epoch):
                for b in data_loader(split_set, batch_size, gconf.max_lanes,
                                     shuffle=shuffle, seed=epoch + seed * 10007,
                                     shard_index=jax.process_index(),
                                     shard_count=jax.process_count()):
                    yield shard_batch(b, mesh)
            return make

    try:
        state = engine.fit(
            state, batches(train_set, True), batches(val_set, False),
            epochs=int(cfg.get("epochs", 101)),
            rng=jax.random.fold_in(root_key, 1),
            val_every=int(cfg.get("val_every", 5)),
            save_every=int(cfg.get("save_every", 20)))
        engine.save(state)
    finally:
        engine.finalize()    # commit any in-flight checkpoint before exit
        logger.close()


if __name__ == "__main__":
    main()
