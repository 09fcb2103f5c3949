"""Batched per-volume inference.

The reference iterates depth slices one-by-one in Python, resizing each on
the host (gm-unet/eval.py:47-88, inference.py:38-112) — its main throughput
bottleneck (SURVEY.md §7, hard part 5). Here the WHOLE volume is processed
on device: exact scipy-parity zoom as matmuls, slices batched through one
jitted forward, argmax + nearest zoom-back on device. Host touches the data
twice (upload volume, download prediction).
"""
from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.resize import zoom_slices, zoom_slices_nearest
from ceigm_unet_tpu.eval.metrics import SegMeter


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _predict_batch(apply_fn, variables, slices, patch: Tuple[int, int],
                   out_hw: Tuple[int, int]):
    """slices: (B, H, W) raw -> (B, H, W) int predictions at original size."""
    x = zoom_slices(slices, patch, order=3)
    x = (x - 0.5) / 0.5  # Normalize(0.5, 0.5) (train_synapse.py:52-55)
    logits = apply_fn(variables, x[..., None])          # (B, p, p, C)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return zoom_slices_nearest(pred, out_hw)


def predict_volume(apply_fn: Callable, variables, volume: np.ndarray,
                   patch_size: Tuple[int, int] = (224, 224),
                   batch_size: int = 32) -> np.ndarray:
    """volume: (D, H, W) float -> (D, H, W) int class map."""
    D, H, W = volume.shape
    preds = []
    pad = (-D) % batch_size
    vol = np.concatenate(
        [volume, np.zeros((pad, H, W), volume.dtype)]) if pad else volume
    for i in range(0, vol.shape[0], batch_size):
        chunk = jnp.asarray(vol[i:i + batch_size])
        preds.append(np.asarray(_predict_batch(
            apply_fn, variables, chunk, tuple(patch_size), (H, W))))
    out = np.concatenate(preds)[:D]
    return out


def eval_single_volume(apply_fn: Callable, variables, volume: np.ndarray,
                       label: np.ndarray, num_classes: int,
                       patch_size: Tuple[int, int] = (224, 224),
                       batch_size: int = 32) -> Dict:
    """Reference eval_single_volume semantics (eval.py:47-88): returns
    {"dice": {class_name: [value]}} via SegMeter."""
    pred = predict_volume(apply_fn, variables, volume, patch_size, batch_size)
    meter = SegMeter(num_classes=num_classes)
    meter(pred[None], np.asarray(label)[None])
    return meter.get_metric()
