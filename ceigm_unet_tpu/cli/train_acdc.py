"""ACDC training entry point (reference gm-unet/train_acdc.py: 4 classes,
batch 32, wd 1e-4, seed 1998, val every 20 epochs then 5; SURVEY.md §2.1)."""
from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from ceigm_unet_tpu.train.config import ACDC_CONFIG
from ceigm_unet_tpu.train.loop import run_training
from ceigm_unet_tpu.data.datasets import ACDCDataset


def load_val_volumes(data_dir: str, list_dir: str):
    ds = ACDCDataset(data_dir, split="test", list_dir=list_dir,
                     augment=False)
    return [ds[i] for i in range(len(ds))]


def main(argv=None):
    p = argparse.ArgumentParser()
    cfg = ACDC_CONFIG
    p.add_argument("--data-dir", default=cfg.data_dir)
    p.add_argument("--list-dir", default=cfg.list_dir)
    p.add_argument("--log-dir", default=cfg.log_dir)
    p.add_argument("--ckpt-dir", default=cfg.ckpt_dir)
    p.add_argument("--batch-size", type=int, default=cfg.batch_size)
    p.add_argument("--max-epochs", type=int, default=cfg.max_epochs)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=cfg.seed)
    p.add_argument("--pretrained-encoder", default=None)
    p.add_argument("--compute-dtype", default=cfg.compute_dtype)
    p.add_argument("--device-aug", action="store_true",
                   help="augment on device inside the sharded train step "
                        "(data/device_aug.py; tracked config 5)")
    a = p.parse_args(argv)

    cfg = dataclasses.replace(
        cfg, data_dir=a.data_dir, list_dir=a.list_dir, log_dir=a.log_dir,
        ckpt_dir=a.ckpt_dir, batch_size=a.batch_size,
        max_epochs=a.max_epochs, seed=a.seed,
        pretrained_encoder=a.pretrained_encoder,
        compute_dtype=a.compute_dtype, device_aug=a.device_aug)

    np.random.seed(cfg.seed)
    train_ds = ACDCDataset(cfg.data_dir, "train", cfg.list_dir,
                           cfg.img_size, seed=cfg.seed,
                           augment=not cfg.device_aug,
                           keep_raw_size=cfg.device_aug)
    val = load_val_volumes(cfg.data_dir, cfg.list_dir)
    run_training(cfg, train_ds, val, max_steps=a.max_steps)


if __name__ == "__main__":
    main()
