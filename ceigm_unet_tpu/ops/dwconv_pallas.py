"""Depthwise conv helper (torch 'same' padding semantics).

A Pallas stencil variant (image resident in VMEM, shifted multiply-adds)
was built and A/B-measured in round 1-2: XLA's conv lowering wins at every
live model shape on v5e, so the stencil was deleted (round-2 decision on
the CEIGM_DW_PALLAS experiment; see git history for the kernel).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias=None) -> jnp.ndarray:
    """Depthwise conv, torch 'same' padding. kernel: (kh, kw, 1, C) flax
    depthwise layout; bias (C,) or None.

    CEIGM_DWSHIFT=1 (opt-in, A/B via tools/exp_dwshift.py): evaluate the
    kh*kw taps as padded static slices + multiply-adds instead of
    conv_general_dilated. Rationale (r3 trace): at C < 128 XLA's depthwise
    emitter picks a PLANAR {2,1,0,3} layout, so every quad-path dwconv
    pays a tokens-minor -> planar relayout of its GEMM-produced input
    (0.276 ms at stage 1) plus a relayout back to the default layout the
    scan kernel needs. The shift form is a plain elementwise fusion that
    XLA keeps in the producer/consumer layout.
    """
    B, H, W, C = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = kh // 2, kw // 2
    if os.environ.get("CEIGM_DWSHIFT", "0") == "1" and C < 128:
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        k = kernel.reshape(kh, kw, -1).astype(x.dtype)
        out = None
        for i in range(kh):
            for j in range(kw):
                t = xp[:, i:i + H, j:j + W, :] * k[i, j]
                out = t if out is None else out + t
        return out if bias is None else out + bias.astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
