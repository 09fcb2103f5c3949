"""Cross-scan / cross-merge layout transforms.

The reference implements these as hand-written CUDA-adjacent autograd
functions (``gm-unet/model/gm/csms6s.py:56-206``) and Triton kernels
(``gm-unet/model/vmamba/csm_triton.py:16-248``). On TPU they are pure layout
transforms (transpose / flip / reshape) that XLA fuses into adjacent ops for
free, so no kernel is needed — autodiff through them is exact and free too.

Directions (reference ``CrossScan_1..4``):
    1: row-major          flatten(H, W)
    2: column-major       flatten(W, H)   (transpose first)
    3: reversed row-major flip(flatten(H, W))
    4: reversed col-major flip(flatten(W, H))

All functions are channel-last (B, H, W, C) on the image side — the
TPU-native layout — and (B, C, L) on the scan side (matching the selective
scan's (batch, dim, L) API).
"""
from __future__ import annotations

import jax.numpy as jnp


def cross_scan_1d(x: jnp.ndarray, direction: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, C, L) in the given scan direction (1..4)."""
    B, H, W, C = x.shape
    if direction in (2, 4):
        x = jnp.swapaxes(x, 1, 2)  # (B, W, H, C)
    xs = x.reshape(B, H * W, C).transpose(0, 2, 1)  # (B, C, L)
    if direction in (3, 4):
        xs = jnp.flip(xs, axis=-1)
    return xs


def cross_merge_1d(y: jnp.ndarray, direction: int, H: int, W: int) -> jnp.ndarray:
    """(B, C, L) -> (B, H, W, C), inverse of :func:`cross_scan_1d`."""
    B, C, L = y.shape
    assert L == H * W
    if direction in (3, 4):
        y = jnp.flip(y, axis=-1)
    if direction in (2, 4):
        x = y.transpose(0, 2, 1).reshape(B, W, H, C)
        x = jnp.swapaxes(x, 1, 2)
    else:
        x = y.transpose(0, 2, 1).reshape(B, H, W, C)
    return x


def cross_scan_4d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 4, C, L): all four directions stacked.

    Reference: ``CrossScan`` (gm-unet/model/gm/csms6s.py:11-29) /
    ``CrossScanTriton`` (model/vmamba/csm_triton.py:176).
    """
    return jnp.stack([cross_scan_1d(x, k) for k in (1, 2, 3, 4)], axis=1)


def cross_merge_4d(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, 4, C, L) -> (B, H, W, C): merge (sum) the four directions.

    Reference: ``CrossMerge`` (gm-unet/model/gm/csms6s.py:32-53).
    """
    return sum(cross_merge_1d(ys[:, k - 1], k, H, W) for k in (1, 2, 3, 4))
