#!/usr/bin/env python
"""phase1: decode raw collected routes once and pickle model-ready samples.

TPU rebuild of run_steps/phase1_preprocess_data.py: iterates the raw dataset
(per-town `<data_folder>/<Town>_short` dirs), validates it (check_data), and
writes `pro_train_f<name>/i.pkl` + `pro_eval_f<name>/i.pkl` pools consumed by
phase2.

Usage:
    python run_steps/phase1_preprocess_data.py --config run_steps/config/train.yaml \
        [key=value overrides...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mmfn_tpu.config import GlobalConfig
from mmfn_tpu.data.dataset import CarlaDataset, check_data, preprocess_to_pickles
from mmfn_tpu.utils.cli import load_config
from mmfn_tpu.utils.logging import bcolors as bc


def town_dirs(root: str, towns, suffix: str = "_short"):
    return [os.path.join(root, t + suffix) for t in towns]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(os.path.dirname(__file__),
                                                     "config", "train.yaml"))
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, args.overrides)

    gconf = GlobalConfig(max_lanes=cfg.get("max_lanes", 64))
    root = cfg["data_folder"]
    name = os.path.basename(os.path.normpath(root))

    for split, towns in (("train", cfg["train_towns"]), ("eval", cfg["val_towns"])):
        dirs = [d for d in town_dirs(root, towns) if os.path.isdir(d)]
        if not dirs:
            print(f"{bc.WARNING}no data dirs for {split} ({towns}){bc.ENDC}")
            continue
        ds = CarlaDataset(dirs, gconf, image_ext=cfg.get("image_ext", "png"))
        bad = check_data(ds)
        if bad:
            print(f"{bc.FAIL}{len(bad)} corrupt samples in {split}: {bad[:10]}...{bc.ENDC}")
        out = os.path.join(os.path.dirname(root), f"pro_{split}_f{name}")
        n = preprocess_to_pickles(ds, out, workers=int(cfg.get("workers", 0)))
        print(f"{bc.OKGREEN}{split}: wrote {n} samples to {out}{bc.ENDC}")


if __name__ == "__main__":
    main()
