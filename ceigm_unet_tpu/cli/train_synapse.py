"""Synapse training entry point (reference gm-unet/train_synapse.py).

The reference hard-codes paths and has no flag parsing; here the same
defaults are exposed as flags. ``python -m ceigm_unet_tpu.cli.train_synapse``
with a Synapse data dir reproduces the reference run configuration
(SURVEY.md §2.1).
"""
from __future__ import annotations

import argparse

import numpy as np

from ceigm_unet_tpu.train.config import SYNAPSE_CONFIG
from ceigm_unet_tpu.train.loop import run_training, setup_logger
from ceigm_unet_tpu.data.datasets import SynapseDataset


def load_val_volumes(data_dir: str, list_dir: str):
    ds = SynapseDataset(data_dir, split="test_vol", list_dir=list_dir,
                        augment=False)
    return [ds[i] for i in range(len(ds))]


def main(argv=None):
    p = argparse.ArgumentParser()
    cfg = SYNAPSE_CONFIG
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
                        "(raw 512² slices -> fused aug+resize, "
                        "data/device_aug.py; tracked config 5)")
    a = p.parse_args(argv)

    import dataclasses
    cfg = dataclasses.replace(
        cfg, data_dir=a.data_dir, list_dir=a.list_dir, log_dir=a.log_dir,
        ckpt_dir=a.ckpt_dir, batch_size=a.batch_size,
        max_epochs=a.max_epochs, seed=a.seed,
        pretrained_encoder=a.pretrained_encoder,
        compute_dtype=a.compute_dtype, device_aug=a.device_aug)

    np.random.seed(cfg.seed)
    train_ds = SynapseDataset(cfg.data_dir + "/train_npz", "train",
                              cfg.list_dir, cfg.img_size, seed=cfg.seed,
                              augment=not cfg.device_aug,
                              keep_raw_size=cfg.device_aug)
    val = load_val_volumes(cfg.data_dir + "/test_vol_h5", cfg.list_dir)
    run_training(cfg, train_ds, val, max_steps=a.max_steps)


if __name__ == "__main__":
    main()
