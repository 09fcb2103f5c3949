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
        # (the fused PVT2FFN kernels that once hung off a CEIGM_FFN gate
        # here were measured-and-lost on hardware and deleted in r5 —
        # XLA's dwconv+fc2+LN mega-fusion already streams the hidden at
        # ~83% of its traffic floor; postmortems in docs/STATUS.md)
        x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                     dtype=self.dtype, name="fc1")(x)
        x = dw_conv(self.hidden, 3, name="dwconv")(x)
        x = fast_gelu(x)
        return nn.Dense(c, kernel_init=trunc_normal(), dtype=self.dtype,
                        name="fc2")(x)


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


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense-compatible names (kernel/bias)."""
    din: int
    dout: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    def setup(self):
        self.kernel = self.param("kernel", self.kernel_init,
                                 (self.din, self.dout))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dout,))


def _use_fused_cffn() -> bool:
    """Gate for the VMEM-resident fused CustomFfn kernel
    (ops/ffn_pallas.py custom_ffn_fused). Default ON on TPU: hardware
    A/B (r3, b64 224²) 52.74 -> 51.63 ms — XLA's decoder-tail fusions
    run 7-16x off the bandwidth floor (49-tap inception stencil inside
    batch-in-lanes reduce-fusions). CEIGM_CFFN=0 disables."""
    import os
    from ceigm_unet_tpu.ops.selective_scan import _resolve_backend
    return (os.environ.get("CEIGM_CFFN", "1") == "1"
            and _resolve_backend("auto") == "pallas")


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
    def composite(self, c: int, dtype):
        """The composite (7,7,1,c) kernel + (c,) bias (branch params
        dw3/dw5/dw7, same tree as the reference split)."""
        from ceigm_unet_tpu.ops.ffn_pallas import inception_composite
        g = int(c * self.branch_ratio)
        p3 = _DwParams(3, g, name="dw3")
        p5 = _DwParams(5, g, name="dw5")
        p7 = _DwParams(7, g, name="dw7")
        return inception_composite(c, g, p3.kernel, p5.kernel,
                                   p7.kernel, p3.bias, p5.bias, p7.bias,
                                   dtype)

    def __call__(self, x):
        from ceigm_unet_tpu.ops.dwconv_pallas import depthwise_conv2d
        K, bias = self.composite(x.shape[-1], x.dtype)
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
        """x: (B, H, W, C)."""
        c = x.shape[-1]
        B, H, W = x.shape[:3]
        if _use_fused_cffn():
            # one VMEM-resident kernel: XLA's decoder-tail fusions run
            # 7-16x off the bandwidth floor here (the 49-tap inception
            # stencil lands in a batch-in-lanes fc2 reduce-fusion — r3
            # trace/HLO); the kernel keeps the hidden plane in VMEM
            w1 = _DenseParams(c, self.hidden, trunc_normal(), name="fc1")
            dwp = _DwParams(3, self.hidden, name="dwconv")
            inck, incb = InceptionDWConvMultiScale(name="custom").composite(
                self.hidden, jnp.float32)
            w2 = _DenseParams(self.hidden, c, trunc_normal(), name="fc2")
            from ceigm_unet_tpu.ops.ffn_pallas import custom_ffn_fused
            y = custom_ffn_fused(
                x.astype(self.dtype).reshape(B, H * W, c),
                w1.kernel, w1.bias, dwp.kernel, dwp.bias, inck, incb,
                w2.kernel, w2.bias, H, W,
                3 * int(self.hidden * 0.125))
            return y.reshape(B, H, W, c)
        x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                     dtype=self.dtype, name="fc1")(x)
        x = dw_conv(self.hidden, 3, name="dwconv")(x)
        x = fast_gelu(x)
        x = InceptionDWConvMultiScale(name="custom")(x)
        return nn.Dense(c, kernel_init=trunc_normal(), dtype=self.dtype,
                        name="fc2")(x)


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
