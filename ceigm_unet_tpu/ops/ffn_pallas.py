"""VMEM-resident fused CustomFfn kernel (decoder-tail FFN).

fc1 -> depthwise 3x3 -> GELU -> inception multi-scale mixer -> fc2 in
ONE pallas call on the flat (L, C) pixel view: the hidden tensor never
exists in HBM, and the 3x3/49-tap stencils run as masked sublane shifts
(default ON — hardware A/B win, STATUS r3 session-7). Reference
counterpart: custom_ffn + InceptionDWConv2d_MultiScale
(gm-unet/model/gm/custom_mlp.py:205-233, 335-368).

The sibling fused PVT2FFN kernels (hidden-shift v1 and matmul-first v2)
were built, measured at model level on hardware, and LOST for structural
reasons (v1: VPU-bound taps; v2: the tap fold pays 10x fc1's FLOPs so
its MXU floor equals the displaced XLA cost) — deleted in r5;
postmortems in docs/STATUS.md r3/r4.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ceigm_unet_tpu.ops.activations import gelu as fast_gelu


def _shift_sub(x, s):
    """Sublane shift: out[p] = x[p + s] (zero fill at the open end)."""
    L = x.shape[0]
    if s == 0:
        return x
    z = jnp.zeros((abs(s), x.shape[1]), x.dtype)
    if s > 0:
        return jnp.concatenate([x[s:], z], axis=0)
    return jnp.concatenate([z, x[:s]], axis=0)


def _col_mask(L, W, dx):
    """(L, 1) fp32 mask: 1 where the source pixel p+dx stays in the same
    image row as p (dx in {-1, 0, 1})."""
    w = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) % W
    if dx > 0:
        return (w < W - dx).astype(jnp.float32)
    if dx < 0:
        return (w >= -dx).astype(jnp.float32)
    return jnp.ones((L, 1), jnp.float32)


def _dw_shift(h, L, W, K, taps):
    """Depthwise KxK ('SAME' zero pad) of the (L, HID) fp32 block ``h``
    via masked sublane shifts. ``taps``: (K*K, HID) fp32 per-lane weights.
    The dx-shifted (masked) tensors are shared across the dy rows — K*K
    taps cost K-1 shifts + K-1 masks instead of K*K shifted+masked
    copies. The dx masks depend only on the pixel's column, which the
    dy*W row shift preserves, so masking before the row shift is exact."""
    R = K // 2
    sx = {0: h}
    for dx in range(1, R + 1):
        sx[dx] = _shift_sub(h, dx) * _col_mask(L, W, dx)
        sx[-dx] = _shift_sub(h, -dx) * _col_mask(L, W, -dx)
    acc = None
    for dy in range(-R, R + 1):
        inner = None
        for dx in range(-R, R + 1):
            t = (dy + R) * K + (dx + R)
            v = sx[dx] * taps[t:t + 1, :]
            inner = v if inner is None else inner + v
        inner = _shift_sub(inner, dy * W)
        acc = inner if acc is None else acc + inner
    return acc


def _cffn_kernel(L, W, G, P, x_ref, w1_ref, w2_ref, dwk_ref, inck_ref,
                 consts_ref, out_ref):
    # consts rows: [b1, dwb, incb] each (1, HID); b2 in row 3's head.
    # Hidden lanes arrive PERMUTED (branch channels first — see
    # custom_ffn_fused): the 49-tap stencil runs only on the first P
    # lanes; the pure-identity remainder is out = 2q there.
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    dwk = dwk_ref[...].astype(jnp.float32)
    inck = inck_ref[...].astype(jnp.float32)
    for g in range(G):
        x = x_ref[g]
        h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = (h + consts_ref[0:1, :]).astype(jnp.float32)
        q = fast_gelu(_dw_shift(h, L, W, 3, dwk) + consts_ref[1:2, :])
        # inception multi-scale mixer: residual + composite 7x7 (identity
        # center tap on pass-through lanes inside the tapped block,
        # zero-padded 3x3/5x5 weights centered)
        if P < q.shape[1]:
            tap = _dw_shift(q[:, :P], L, W, 7, inck)
            q = (jnp.concatenate([q[:, :P] + tap, 2.0 * q[:, P:]], axis=1)
                 + consts_ref[2:3, :])
        else:
            q = q + _dw_shift(q, L, W, 7, inck) + consts_ref[2:3, :]
        o = jax.lax.dot_general(q.astype(w2.dtype), w2,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[g] = (o + consts_ref[3:4, :out_ref.shape[2]]).astype(
            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _cffn_call(x, w1, w2, dwk, inck, consts, H, W, interpret=False):
    B, L, C = x.shape
    HID = w1.shape[1]
    P = inck.shape[1]                   # tapped lane-block width
    G = 4 if B % 4 == 0 else 1
    spec_x = pl.BlockSpec((G, L, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_cffn_kernel, L, W, G, P),
        grid=(B // G,),
        in_specs=[
            spec_x,
            pl.BlockSpec((C, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, w2, dwk, inck, consts)


def inception_composite(c: int, g: int, p3k, p5k, p7k, p3b, p5b, p7b,
                        dtype):
    """Composite (7, 7, 1, c) depthwise kernel + (c,) bias implementing
    InceptionDWConv2d_MultiScale's split (identity on the first c-3g
    lanes, centered 3x3/5x5/7x7 on the rest) as ONE slice-free depthwise
    pass (reference model/gm/custom_mlp.py:205-233)."""
    K = jnp.zeros((7, 7, 1, c), dtype)
    ident = jnp.zeros((7, 7, 1, c - 3 * g), dtype).at[3, 3].set(1.0)
    K = K.at[:, :, :, :c - 3 * g].set(ident)
    K = K.at[2:5, 2:5, :, c - 3 * g:c - 2 * g].set(p3k.astype(dtype))
    K = K.at[1:6, 1:6, :, c - 2 * g:c - g].set(p5k.astype(dtype))
    K = K.at[:, :, :, c - g:].set(p7k.astype(dtype))
    bias = jnp.concatenate([
        jnp.zeros(c - 3 * g, dtype), p3b.astype(dtype),
        p5b.astype(dtype), p7b.astype(dtype)])
    return K, bias


def _cffn_ref(x, w1, b1, dwk, dwb, inck, incb, w2, b2, H, W):
    """Equivalent XLA composition (bwd recompute + CPU/fp32 reference):
    fc1 -> dw3x3 -> GELU -> (q + composite7x7(q) + incb) -> fc2."""
    B, L, C = x.shape
    h = jnp.einsum("blc,ch->blh", x, w1) + b1.astype(x.dtype)

    def dw(t4, k):
        return jax.lax.conv_general_dilated(
            t4, k.astype(t4.dtype), (1, 1),
            [(k.shape[0] // 2, k.shape[0] // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=t4.shape[-1])

    hc = dw(h.reshape(B, H, W, -1), dwk)
    q = fast_gelu((hc + dwb.astype(hc.dtype)).astype(jnp.float32))
    q = q + dw(q, inck.astype(jnp.float32)) + incb.astype(jnp.float32)
    q = q.reshape(B, L, -1)
    o = jnp.einsum("blh,hc->blc", q.astype(w2.dtype), w2)
    return (o + b2.astype(o.dtype)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def custom_ffn_fused(x, w1, b1, dwk, dwb, inck, incb, w2, b2, H, W,
                     n_tap=0):
    """Fused CustomFfn tail on (B, H*W, C) pixel-flat input: fc1 ->
    dw3x3 -> GELU -> inception multi-scale mixer (residual + composite
    7x7) -> fc2, all VMEM-resident (the hidden tensor never hits HBM).

    w1 (C, HID), b1 (HID), dwk (3, 3, 1, HID), dwb (HID), inck
    (7, 7, 1, HID) composite (see :func:`inception_composite`), incb
    (HID), w2 (HID, C), b2 (C). Reference: custom_ffn
    (gm-unet/model/gm/custom_mlp.py:335-368).

    ``n_tap``: number of NON-identity composite lanes (= 3g, the tail of
    the channel axis). When set, the hidden lanes are permuted at trace
    time so the tapped channels occupy a 128-aligned lane prefix and the
    49-tap stencil runs only there (the pure-identity remainder is 2q) —
    the permutation is folded into the weights, so inputs/outputs and
    gradients are unchanged."""
    return _cffn_fwd(x, w1, b1, dwk, dwb, inck, incb, w2, b2, H, W,
                     n_tap)[0]


def _cffn_fwd(x, w1, b1, dwk, dwb, inck, incb, w2, b2, H, W, n_tap=0):
    import numpy as np
    interpret = jax.default_backend() != "tpu"
    HID = w1.shape[1]
    dt = x.dtype
    if n_tap:
        P = min(HID, -(-n_tap // 128) * 128)
        perm = np.concatenate([np.arange(HID - n_tap, HID),
                               np.arange(HID - n_tap)])
        w1p, b1p, dwbp, incbp = w1[:, perm], b1[perm], dwb[perm], incb[perm]
        dwkf = dwk.reshape(9, HID)[:, perm]
        inckf = inck.reshape(49, HID)[:, perm][:, :P]
        w2p = w2[perm, :]
    else:
        w1p, b1p, dwbp, incbp, w2p = w1, b1, dwb, incb, w2
        dwkf = dwk.reshape(9, HID)
        inckf = inck.reshape(49, HID)
    consts = jnp.zeros((4, HID), jnp.float32)
    consts = consts.at[0, :].set(b1p.astype(jnp.float32))
    consts = consts.at[1, :].set(dwbp.astype(jnp.float32))
    consts = consts.at[2, :].set(incbp.astype(jnp.float32))
    consts = consts.at[3, :b2.shape[0]].set(b2.astype(jnp.float32))
    y = _cffn_call(x, w1p.astype(dt), w2p.astype(dt), dwkf.astype(dt),
                   inckf.astype(jnp.float32), consts,
                   H, W, interpret=interpret)
    return y, (x, w1, b1, dwk, dwb, inck, incb, w2, b2)


def _cffn_bwd(H, W, n_tap, res, ct):
    x, w1, b1, dwk, dwb, inck, incb, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _cffn_ref(*a, H, W), x, w1, b1, dwk, dwb, inck, incb,
        w2, b2)
    return vjp(ct)


custom_ffn_fused.defvjp(_cffn_fwd, _cffn_bwd)


