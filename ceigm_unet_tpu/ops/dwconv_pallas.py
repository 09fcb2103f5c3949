"""Pallas depthwise-conv (stencil) kernel.

Depthwise convolutions have contraction size 1 — no MXU use — and both
XLA's conv lowering and unrolled shift-adds materialize intermediates to
HBM (profiled 6-9 ms per decoder block). This kernel keeps one image
entirely in VMEM and accumulates the kh*kw shifted multiply-adds in
registers: HBM traffic is exactly one read + one write.

Applicable when one padded image fits VMEM ((H+2ph)*(W+2pw)*C*bytes within
budget); callers fall back to lax.conv otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 6 * 1024 * 1024  # per padded input block


def _stencil_kernel(kh: int, kw: int, x_ref, k_ref, b_ref, out_ref):
    xp = x_ref[0]
    H = out_ref.shape[1]
    W = out_ref.shape[2]
    acc = jnp.broadcast_to(b_ref[0:1, :], (H, W, out_ref.shape[3])) * 1.0
    for dy in range(kh):
        for dx in range(kw):
            acc = acc + (xp[dy:dy + H, dx:dx + W, :].astype(jnp.float32)
                         * k_ref[dy * kw + dx])
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dw_pallas(x, kern2d, bias, interpret=False):
    B, H, W, C = x.shape
    kh, kw = kern2d.shape[0], kern2d.shape[1]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    kr = kern2d.reshape(kh * kw, C).astype(jnp.float32)
    br = bias.reshape(1, C).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_stencil_kernel, kh, kw),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2 * ph, W + 2 * pw, C),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, kr, br)


def depthwise_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias=None) -> jnp.ndarray:
    """Depthwise conv, torch 'same' padding. kernel: (kh, kw, 1, C) flax
    depthwise layout; bias (C,) or None. Picks the Pallas stencil on TPU
    when the image fits VMEM, else lax.conv."""
    B, H, W, C = x.shape
    kh, kw = kernel.shape[0], kernel.shape[1]
    ph, pw = kh // 2, kw // 2
    b = (bias if bias is not None else jnp.zeros((C,), x.dtype))
    kern2d = kernel[:, :, 0, :]

    import os
    on_tpu = jax.default_backend() == "tpu"
    vmem_need = (H + 2 * ph) * (W + 2 * pw) * C * x.dtype.itemsize
    # measured slower than XLA's conv lowering on v5e for the model's
    # shapes; opt-in via env until the kernel is tuned
    use_pallas = os.environ.get("CEIGM_DW_PALLAS") == "1"
    if use_pallas and on_tpu and vmem_need <= VMEM_BUDGET and H * W >= 256:
        return _dw_pallas(x, kern2d, b, interpret=False)
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    return out + b.astype(x.dtype)
