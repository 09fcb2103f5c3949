"""Depthwise conv helper (torch 'same' padding semantics).

A Pallas stencil variant (image resident in VMEM, shifted multiply-adds)
was built and A/B-measured in round 1-2: XLA's conv lowering wins at every
live model shape on v5e, so the stencil was deleted (round-2 decision on
the CEIGM_DW_PALLAS experiment; see git history for the kernel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias=None) -> jnp.ndarray:
    """Depthwise conv, torch 'same' padding. kernel: (kh, kw, 1, C) flax
    depthwise layout; bias (C,) or None."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = kh // 2, kw // 2
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
