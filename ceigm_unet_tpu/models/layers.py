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


def use_wide() -> bool:
    """Gate for wide-lane stages: activations of stages whose channel
    count is not a multiple of the 128-lane tile run zero-padded to the
    next multiple. Rationale (r3 device traces, docs/STATUS.md): for
    C < 128 tensors XLA prefers batch/space-in-lanes layouts, which makes
    every pallas custom-call boundary a relayout cliff and cripples the
    LN stat fusions (~17x off bandwidth). All padding happens in weights
    at trace time — parameter shapes and checkpoints are unchanged."""
    import os
    return os.environ.get("CEIGM_WIDE", "0") == "1"


def _flat_mode() -> str:
    import os
    return "0" if use_wide() else os.environ.get("CEIGM_FLAT", "0")


def use_flat_chain() -> bool:
    """Gate (CEIGM_FLAT=1|all|enc): run the ENCODER BlockMamba chains in
    the flat (B, L, C) token view — flatten once at stage entry,
    unflatten at exit. Rationale (r3 b128 trace): the dim-64 blocks
    spend ~2.5 of 3.73 ms in relayouts, the worst being the out-proj
    GEMM's tokens-minor {0,1} output hopping through {2,1,0,3} to the
    consumer's {0,3,2,1} 4-D layout (1.39 ms/block). Measured and LOST
    whole-model (87.4 -> 96.8 ms b128: the unfused Pvt2Ffn dwconv
    boundary relayouts more than the flat view saves) — encoder flat
    stays default OFF."""
    return _flat_mode() in ("1", "all", "enc")


def use_flat_front() -> bool:
    """Gate (CEIGM_FLAT=1|all|front): flat token view for the decoder
    Front stacks only — there the FFN is the fused CustomFfn pallas
    kernel (consumes (B, L, C) directly, no XLA dwconv boundary)."""
    return _flat_mode() in ("1", "all", "front")


def wide_dim(c: int) -> int:
    """Lane-tile-aligned activation width for channel count ``c``."""
    return c if c % 128 == 0 else -(-c // 128) * 128


def pad_lanes(x: jnp.ndarray, wide: int) -> jnp.ndarray:
    """Zero-pad the channel (last) axis to ``wide`` lanes."""
    c = x.shape[-1]
    if c == wide:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, wide - c)])


class PadDense(nn.Module):
    """nn.Dense computed at a wide lane-padded width with TRUE-shaped
    parameters: the kernel/bias are zero-padded at trace time to accept
    ``true_in``-real/-pad-lane inputs and emit ``wide_out`` lanes (pads
    zero). Parameter names and shapes match nn.Dense exactly, so the
    checkpoint tree is unchanged."""
    features: int                    # true output features (param shape)
    true_in: int                     # true input features (param shape)
    wide_out: int = 0                # 0 = features (no output padding)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        wi = x.shape[-1]
        wo = self.wide_out or self.features
        k = self.param("kernel", self.kernel_init,
                       (self.true_in, self.features))
        kw = jnp.pad(k, ((0, wi - self.true_in),
                         (0, wo - self.features))).astype(self.dtype)
        y = jax.lax.dot_general(x.astype(self.dtype), kw,
                                (((x.ndim - 1,), (0,)), ((), ())))
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            y = y + jnp.pad(b, (0, wo - self.features)).astype(self.dtype)
        return y


class PadLN(nn.Module):
    """LayerNorm over the TRUE leading ``true_c`` lanes of a zero-padded
    channel axis: statistics divide by ``true_c`` (pad lanes hold zeros),
    and the zero-padded scale keeps the output's pad lanes exactly zero.
    Parameter names/shapes match nn.LayerNorm (scale/bias, (true_c,))."""
    true_c: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = x.shape[-1]
        s = self.param("scale", nn.initializers.ones, (self.true_c,))
        b = self.param("bias", nn.initializers.zeros, (self.true_c,))
        xf = x.astype(jnp.float32)
        inv = 1.0 / float(self.true_c)
        mu = jnp.sum(xf, axis=-1, keepdims=True) * inv
        var = jnp.sum(xf * xf, axis=-1, keepdims=True) * inv - mu * mu
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        pad = (0, w - self.true_c)
        return y * jnp.pad(s, pad).astype(jnp.float32) + jnp.pad(
            b, pad).astype(jnp.float32)


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
    groupmamba.py:54-83). Input (B, H, W, C).

    ``true_c`` (wide-lane mode): real channel count when the input's
    channel axis arrives zero-padded past it — fc1/fc2 run as PadDense
    with trace-time zero-padded weights (identical parameter tree)."""
    hidden: int
    dtype: jnp.dtype = jnp.float32
    true_c: int = 0

    @nn.compact
    def __call__(self, x, hw=None):
        """x: (B, H, W, C), or flat (B, L, C) with ``hw`` (flat-chain
        mode, layers.use_flat_chain) — output rank matches the input."""
        c = x.shape[-1]
        flat = x.ndim == 3
        B = x.shape[0]
        H, W = hw if flat else x.shape[1:3]
        wide = bool(self.true_c) and self.true_c != c
        if _use_fused_ffn(c) and not wide:
            # one VMEM-resident kernel: the hidden tensor never hits HBM
            # (ops/ffn_pallas.py; the unfused chain is ~1.4 ms/block of
            # pure HBM traffic at stage-1 — r3 HLO/trace analysis)
            w1 = _DenseParams(c, self.hidden, trunc_normal(), name="fc1")
            dwp = _DwParams(3, self.hidden, name="dwconv")
            w2 = _DenseParams(self.hidden, c, trunc_normal(), name="fc2")
            from ceigm_unet_tpu.ops.ffn_pallas import pvt2ffn_fused
            y = pvt2ffn_fused(
                x.astype(self.dtype).reshape(B, H, W, c),
                w1.kernel, w1.bias, dwp.kernel, dwp.bias,
                w2.kernel, w2.bias)
            return y.reshape(B, H * W, c) if flat else y
        if wide:
            x = PadDense(self.hidden, true_in=self.true_c,
                         kernel_init=trunc_normal(), dtype=self.dtype,
                         name="fc1")(x)
        else:
            x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                         dtype=self.dtype, name="fc1")(x)
        if flat:
            x = x.reshape(B, H, W, self.hidden)
        x = dw_conv(self.hidden, 3, name="dwconv")(x)
        x = fast_gelu(x)
        if flat:
            x = x.reshape(B, H * W, self.hidden)
        if wide:
            x = PadDense(self.true_c, true_in=self.hidden, wide_out=c,
                         kernel_init=trunc_normal(), dtype=self.dtype,
                         name="fc2")(x)
        else:
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


def _mm_ffn_eligible(c: int) -> bool:
    """Channel counts the matmul-first FFN kernel handles: chunks of C
    lanes concatenate into full 128-lane MXU K-tiles (encoder stages 1-2
    in the live configs: c = 64 / 128)."""
    return c > 0 and (c % 128 == 0 or (c <= 128 and 128 % c == 0))


def _use_fused_ffn(c: int = 0) -> bool:
    """Gate for the VMEM-resident fused PVT2FFN kernel
    (ops/ffn_pallas.py). CEIGM_FFN: "0" off, "1" = stages where the
    matmul-first kernel applies (see _mm_ffn_eligible — the r3
    hidden-shift kernel lost its model A/B, so only the mm formulation
    is default-worthy), "all" everywhere, or an integer N > 1 = fused
    only where the model dim c >= N. At stage 1 (c=64) XLA's
    dwconv+fc2+LN-stat mega-fusion streams the 205 MB hidden ~2.5
    passes/block (~1.4 ms/block, r3 HLO/trace); the mm kernel keeps the
    hidden in VMEM and runs the taps as full-tile MXU GEMMs."""
    import os
    from ceigm_unet_tpu.ops.selective_scan import _resolve_backend
    v = os.environ.get("CEIGM_FFN", "0")
    if v == "0" or _resolve_backend("auto") != "pallas":
        return False
    if v == "1":
        return (_mm_ffn_eligible(c)
                if os.environ.get("CEIGM_FFN_MM", "1") == "1" else True)
    return v == "all" or (v.isdigit() and c >= int(v))


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
    the decoder-side mamba refinement blocks. ``true_c``: see Pvt2Ffn.
    """
    hidden: int
    dtype: jnp.dtype = jnp.float32
    true_c: int = 0

    @nn.compact
    def __call__(self, x, hw=None):
        """x: (B, H, W, C), or flat (B, L, C) with ``hw`` (flat-chain
        mode, layers.use_flat_chain) — output rank matches the input."""
        c = x.shape[-1]
        flat = x.ndim == 3
        B = x.shape[0]
        H, W = hw if flat else x.shape[1:3]
        wide = bool(self.true_c) and self.true_c != c
        if _use_fused_cffn() and not wide:
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
            return y if flat else y.reshape(B, H, W, c)
        if wide:
            x = PadDense(self.hidden, true_in=self.true_c,
                         kernel_init=trunc_normal(), dtype=self.dtype,
                         name="fc1")(x)
        else:
            x = nn.Dense(self.hidden, kernel_init=trunc_normal(),
                         dtype=self.dtype, name="fc1")(x)
        if flat:
            x = x.reshape(B, H, W, self.hidden)
        x = dw_conv(self.hidden, 3, name="dwconv")(x)
        x = fast_gelu(x)
        x = InceptionDWConvMultiScale(name="custom")(x)
        if flat:
            x = x.reshape(B, H * W, self.hidden)
        if wide:
            x = PadDense(self.true_c, true_in=self.hidden, wide_out=c,
                         kernel_init=trunc_normal(), dtype=self.dtype,
                         name="fc2")(x)
        else:
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
