"""Test/inference driver (reference gm-unet/inference.py).

Per-case volume inference with the 4-metric suite (dice, hd95, jaccard,
asd — medpy semantics), per-case -> per-class -> global aggregation and
logging, for Synapse (9 classes) and ACDC (4 classes).

Checkpoint loading supports both this framework's orbax checkpoints and
torch Lightning checkpoints (``_model.`` prefix strip + conversion,
reference inference.py:175-221).
"""
from __future__ import annotations

import argparse
import os
from collections import defaultdict
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.eval.metrics import (
    dice_binary, jaccard_binary, surface_metrics, CLASS_COLOR_MAPS)
from ceigm_unet_tpu.eval.volume import predict_volume
from ceigm_unet_tpu.models import build_model
from ceigm_unet_tpu.train.loop import setup_logger


def load_variables(ckpt_path: str):
    """orbax dir or torch .ckpt/.pth file -> flax variables."""
    if os.path.isdir(ckpt_path):
        from ceigm_unet_tpu.train.loop import load_checkpoint
        payload = load_checkpoint(ckpt_path)
        return {"params": payload["params"],
                "batch_stats": payload["batch_stats"]}
    import torch
    from ceigm_unet_tpu.convert import (
        convert_msvm_unet_state_dict, strip_lightning_prefix)
    raw = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw)
    sd = strip_lightning_prefix(sd)
    return convert_msvm_unet_state_dict(sd)


def test_single_volume(apply_fn, variables, image, label, num_classes,
                       patch_size=(224, 224)) -> Dict[str, Dict[str, float]]:
    """Reference test_single_volume (inference.py:38-112): returns
    {class_name: {dice, hd95, jaccard, asd}}."""
    pred = predict_volume(apply_fn, variables, np.asarray(image),
                          patch_size)
    out = {}
    for cls_name, (idx, _) in CLASS_COLOR_MAPS[num_classes].items():
        p = pred == idx
        g = np.asarray(label) == idx
        m = {"dice": dice_binary(p, g), "jaccard": jaccard_binary(p, g)}
        m.update(surface_metrics(p, g))
        out[cls_name] = m
    return out


def run_inference(dataset, variables, num_classes: int, logger,
                  patch_size=(224, 224), apply_fn=None):
    """Reference inference() aggregation (inference.py:114-173).

    ``apply_fn(variables, x)`` defaults to the real model's apply;
    injectable so the aggregation path is testable against an exact
    synthetic predictor (tests/test_eval_metrics.py)."""
    if apply_fn is None:
        model = build_model(num_classes=num_classes, scan_backend="auto")
        apply_fn = lambda v, x: model.apply(v, x)

    per_class = defaultdict(lambda: defaultdict(list))
    case_means = []
    for i in range(len(dataset)):
        sample = dataset[i]
        metrics = test_single_volume(
            apply_fn, variables, sample["image"], sample["label"],
            num_classes, patch_size)
        dices = [m["dice"] for m in metrics.values()]
        case_means.append(float(np.mean(dices)))
        logger.info(f"case {sample['case_name']}: "
                    f"mean_dice {case_means[-1]:.4f}")
        for cls_name, m in metrics.items():
            for k, v in m.items():
                per_class[cls_name][k].append(v)

    summary = {}
    for cls_name, md in per_class.items():
        summary[cls_name] = {k: float(np.nanmean(v)) for k, v in md.items()}
        logger.info(f"class {cls_name}: " + " ".join(
            f"{k} {v:.4f}" for k, v in summary[cls_name].items()))
    global_means = {k: float(np.nanmean([summary[c][k] for c in summary]))
                    for k in ("dice", "hd95", "jaccard", "asd")}
    logger.info("global: " + " ".join(
        f"{k} {v:.4f}" for k, v in global_means.items()))
    return summary, global_means


def test_synapse(ckpt: str, data_dir: str, list_dir: str, log_dir: str):
    from ceigm_unet_tpu.data.datasets import SynapseDataset
    logger = setup_logger(log_dir, "inference_synapse")
    ds = SynapseDataset(data_dir, "test_vol", list_dir, augment=False)
    return run_inference(ds, load_variables(ckpt), 9, logger)


def test_acdc(ckpt: str, data_dir: str, list_dir: str, log_dir: str):
    from ceigm_unet_tpu.data.datasets import ACDCDataset
    logger = setup_logger(log_dir, "inference_acdc")
    ds = ACDCDataset(data_dir, "test", list_dir, augment=False)
    return run_inference(ds, load_variables(ckpt), 4, logger)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["synapse", "acdc"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--list-dir", default=None)
    p.add_argument("--log-dir", default="./logs")
    a = p.parse_args(argv)
    if a.dataset == "synapse":
        test_synapse(a.ckpt, a.data_dir,
                     a.list_dir or "./lists/lists_Synapse", a.log_dir)
    else:
        test_acdc(a.ckpt, a.data_dir,
                  a.list_dir or "./lists/lists_ACDC", a.log_dir)


if __name__ == "__main__":
    main()
