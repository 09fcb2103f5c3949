"""Shared building-block layers (channel-last / NHWC throughout).

Reference counterparts: DWConv / PVT2FFN (gm-unet/model/gm/groupmamba.py:
54-83, 445-455), custom_ffn + InceptionDWConv2d_MultiScale
(model/gm/custom_mlp.py:205-233, 335-368), DropPath (timm), channel_shuffle
(model/best_decoder.py:73-82).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ceigm_unet_tpu.ops.activations import gelu as fast_gelu

from ceigm_unet_tpu.utils.initializers import (
    trunc_normal, conv_fan_out_normal_grouped)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""
    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic,
                             deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DwConv(nn.Module):
    """Depthwise conv (groups == channels) computed as kh*kw shifted
    multiply-accumulates instead of an XLA conv.

    Depthwise convolutions have contraction size 1, so the MXU is useless
    for them and XLA's conv lowering is slow for narrow channel counts
    (profiled ~3x slower than this VPU formulation on the decoder's
    7x7/32-channel branches). Parameter shapes match nn.Conv's depthwise
    layout (kernel (kh, kw, 1, C)), so checkpoints are interchangeable.
    """
    features: int
    kernel: int | tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = ((self.kernel, self.kernel)
                  if isinstance(self.kernel, int) else self.kernel)
        c = self.features
        k = self.param("kernel", conv_fan_out_normal_grouped(c),
                       (kh, kw, 1, c))
        from ceigm_unet_tpu.ops.dwconv_pallas import depthwise_conv2d
        b = (self.param("bias", nn.initializers.zeros, (c,))
             if self.use_bias else None)
        return depthwise_conv2d(x, k, b)


def dw_conv(features: int, kernel: int, use_bias: bool = True,
            name: Optional[str] = None) -> DwConv:
    """Depthwise conv (groups == channels), torch padding=k//2 ('SAME')."""
    return DwConv(features=features, kernel=kernel, use_bias=use_bias,
                  name=name)


class Pvt2Ffn(nn.Module):
    """fc1 -> depthwise 3x3 -> GELU -> fc2 (reference PVT2FFN,
    groupmamba.py:54-83). Input (B, H, W, C)."""
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                     dtype=self.dtype, name="fc1")(x)
        x = dw_conv(self.hidden, 3, name="dwconv")(x)
        x = fast_gelu(x)
        x = nn.Dense(c, kernel_init=trunc_normal(), dtype=self.dtype,
                     name="fc2")(x)
        return x


class _DwParams(nn.Module):
    """Parameter holder with nn.Conv-compatible names (kernel/bias)."""
    k: int
    c: int
    use_bias: bool = True

    def setup(self):
        self.kernel = self.param("kernel", conv_fan_out_normal_grouped(
            self.c), (self.k, self.k, 1, self.c))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (self.c,))


class InceptionDWConvMultiScale(nn.Module):
    """Residual multi-scale depthwise mixer.

    Semantics (reference InceptionDWConv2d_MultiScale,
    model/gm/custom_mlp.py:205-233): channels split (C-3g | g | g | g) with
    g = C/8; identity on the first slice, depthwise 3x3 / 5x5 / 7x7 on the
    rest; the input added back (so identity channels double).

    TPU implementation detail: the per-branch channel slices fall on
    lane-misaligned offsets, which forces relayouts (profiled ~6 ms/block).
    Instead the three branch kernels are embedded into ONE composite 7x7
    depthwise kernel (identity delta on the pass-through channels,
    zero-padded 3x3/5x5 weights centered) — one slice-free depthwise pass,
    bit-identical results, identical parameter tree.
    """
    branch_ratio: float = 0.125

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = int(c * self.branch_ratio)
        p3 = _DwParams(3, g, name="dw3")
        p5 = _DwParams(5, g, name="dw5")
        p7 = _DwParams(7, g, name="dw7")

        K = jnp.zeros((7, 7, 1, c), x.dtype)
        ident = jnp.zeros((7, 7, 1, c - 3 * g), x.dtype
                          ).at[3, 3].set(1.0)
        K = K.at[:, :, :, :c - 3 * g].set(ident)
        K = K.at[2:5, 2:5, :, c - 3 * g:c - 2 * g].set(
            p3.kernel.astype(x.dtype))
        K = K.at[1:6, 1:6, :, c - 2 * g:c - g].set(
            p5.kernel.astype(x.dtype))
        K = K.at[:, :, :, c - g:].set(p7.kernel.astype(x.dtype))
        bias = jnp.concatenate([
            jnp.zeros(c - 3 * g, x.dtype), p3.bias.astype(x.dtype),
            p5.bias.astype(x.dtype), p7.bias.astype(x.dtype)])

        from ceigm_unet_tpu.ops.dwconv_pallas import depthwise_conv2d
        return x + depthwise_conv2d(x, K, bias)


class CustomFfn(nn.Module):
    """fc1 -> dw3x3 -> GELU -> InceptionDWConvMultiScale -> fc2.

    Reference: custom_ffn (model/gm/custom_mlp.py:335-368) — the MLP used by
    the decoder-side mamba refinement blocks.
    """
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                     dtype=self.dtype, name="fc1")(x)
        x = dw_conv(self.hidden, 3, name="dwconv")(x)
        x = fast_gelu(x)
        x = InceptionDWConvMultiScale(name="custom")(x)
        x = nn.Dense(c, kernel_init=trunc_normal(), dtype=self.dtype,
                     name="fc2")(x)
        return x


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Channel-last channel shuffle (reference best_decoder.py:73-82).

    Note the live decoder calls this with groups == channels, which is the
    identity permutation; kept for API parity with other group counts.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


def bilinear_upsample(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear 2x/4x upsample with half-pixel centers (matches
    torch F.interpolate(..., mode='bilinear', align_corners=False))."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), "bilinear")
