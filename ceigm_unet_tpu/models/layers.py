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


def dw_conv(features: int, kernel: int, use_bias: bool = True,
            name: Optional[str] = None) -> nn.Conv:
    """Depthwise conv (groups == channels), torch padding=k//2 ('SAME')."""
    return nn.Conv(
        features=features, kernel_size=(kernel, kernel), padding="SAME",
        feature_group_count=features, use_bias=use_bias,
        kernel_init=conv_fan_out_normal_grouped(features), name=name)


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
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(c, kernel_init=trunc_normal(), dtype=self.dtype,
                     name="fc2")(x)
        return x


class InceptionDWConvMultiScale(nn.Module):
    """Residual multi-scale depthwise mixer.

    Splits channels (C - 3g | g | g | g) with g = C/8; identity on the first
    slice, depthwise 3x3 / 5x5 / 7x7 on the rest; adds the input back.
    Reference: InceptionDWConv2d_MultiScale (model/gm/custom_mlp.py:205-233).
    """
    branch_ratio: float = 0.125

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = int(c * self.branch_ratio)
        xi, x3, x5, x7 = jnp.split(x, [c - 3 * g, c - 2 * g, c - g], axis=-1)
        y3 = dw_conv(g, 3, name="dw3")(x3)
        y5 = dw_conv(g, 5, name="dw5")(x5)
        y7 = dw_conv(g, 7, name="dw7")(x7)
        return x + jnp.concatenate([xi, y3, y5, y7], axis=-1)


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
        x = nn.gelu(x, approximate=False)
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
