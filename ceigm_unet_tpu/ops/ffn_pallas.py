"""VMEM-resident fused PVT2FFN: fc1 -> depthwise 3x3 -> GELU -> fc2.

The unfused chain is HBM-bandwidth-bound on the hidden tensor: at the
stage-1 shape (56², C=64, hidden=512, b64) it moves ~820 MB per block
(fc1 write + dwconv read/write + fc2 read) and XLA's best fusion of it
(the dwconv+fc2+LN mega-fusion, r3 HLO dump) still runs ~1.4 ms/block.
This kernel keeps the hidden activation entirely in VMEM: HBM sees the
(L, C) input once and the (L, C) output once (~50 MB) — the hidden
tensor never exists in HBM.

Layout: one grid step per batch item on the flat (L, C) pixel view
(pixels in sublanes, channels in lanes — full MXU tiles for both GEMMs).
The depthwise 3x3 runs as 9 masked sublane shifts of the (L, HID) hidden
block: a (dy, dx) tap is one concat-shift by dy*W + dx with an iota mask
killing pixels whose column index wrapped across a row edge (same
pattern as the LGAG tap-conv kernel, ops/tapconv.py) — zero fill
reproduces the 'SAME' zero padding exactly.

Backward: recompute-based custom VJP through the equivalent XLA
composition (`_ffn_ref`) — exact adjoint, unfused math (training path).

Reference counterpart: PVT2FFN (gm-unet/model/gm/groupmamba.py:54-83).
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


def _ffn_kernel(L, W, G, x_ref, w1_ref, w2_ref, dwk_ref, consts_ref,
                out_ref):
    # consts rows: [b1, dwb] each (1, HID); b2 (1, C) in its own row tail
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    # column-edge masks shared by every image and dy row
    mm = _col_mask(L, W, -1)
    mp = _col_mask(L, W, 1)
    for g in range(G):
        x = x_ref[g]
        h = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = (h + consts_ref[0:1, :]).astype(jnp.float32)  # (L, HID) fp32

        # depthwise 3x3: the three dx-shifted (masked) tensors are shared
        # across the dy rows — 9 taps cost 4 shifts + 2 masks instead of
        # 9 shifted+masked copies
        sxm = _shift_sub(h, -1) * mm
        sxp = _shift_sub(h, 1) * mp
        acc = None
        for dy in (-1, 0, 1):
            t0 = (dy + 1) * 3
            inner = (sxm * dwk_ref[t0:t0 + 1, :].astype(jnp.float32)
                     + h * dwk_ref[t0 + 1:t0 + 2, :].astype(jnp.float32)
                     + sxp * dwk_ref[t0 + 2:t0 + 3, :].astype(jnp.float32))
            inner = _shift_sub(inner, dy * W)
            acc = inner if acc is None else acc + inner
        gact = fast_gelu(acc + consts_ref[1:2, :])

        o = jax.lax.dot_general(gact.astype(w2.dtype), w2,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[g] = (o + consts_ref[2:3, :out_ref.shape[2]]).astype(
            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _ffn_call(x, w1, w2, dwk, consts, H, W, interpret=False):
    B, L, C = x.shape
    HID = w1.shape[1]
    # batch G images per grid step to amortize the ~1.5 us/step fixed
    # cost (26 blocks x 64 steps traced at ~2.5 ms model-wide without it)
    G = 4 if B % 4 == 0 else 1
    spec_x = pl.BlockSpec((G, L, C), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_kernel, L, W, G),
        grid=(B // G,),
        in_specs=[
            spec_x,
            pl.BlockSpec((C, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, w2, dwk, consts)


def _ffn_ref(x, w1, b1, dwk, dwb, w2, b2, H, W):
    """Equivalent XLA composition (bwd recompute + CPU/fp32 reference)."""
    B, L, C = x.shape
    h = jnp.einsum("blc,ch->blh", x, w1) + b1.astype(x.dtype)
    h4 = h.reshape(B, H, W, -1)
    hc = jax.lax.conv_general_dilated(
        h4, dwk.astype(h4.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h.shape[-1])
    g = fast_gelu((hc + dwb.astype(hc.dtype)).reshape(B, L, -1)
                  .astype(jnp.float32))
    o = jnp.einsum("blh,hc->blc", g.astype(w2.dtype), w2)
    return (o + b2.astype(o.dtype)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def pvt2ffn_fused(x, w1, b1, dwk, dwb, w2, b2, H, W):
    """Fused fc1 -> dw3x3 -> GELU -> fc2 on (B, H*W, C) pixel-flat input.

    w1 (C, HID), b1 (HID), dwk (3, 3, 1, HID), dwb (HID), w2 (HID, C),
    b2 (C). Returns (B, H*W, C) in x.dtype. The hidden tensor stays in
    VMEM (never hits HBM); backward recomputes through the XLA
    composition.
    """
    return _ffn_fwd(x, w1, b1, dwk, dwb, w2, b2, H, W)[0]


def _ffn_fwd(x, w1, b1, dwk, dwb, w2, b2, H, W):
    interpret = jax.default_backend() != "tpu"
    HID = w1.shape[1]
    dt = x.dtype
    consts = jnp.zeros((3, HID), jnp.float32)
    consts = consts.at[0, :].set(b1.astype(jnp.float32))
    consts = consts.at[1, :].set(dwb.astype(jnp.float32))
    consts = consts.at[2, :b2.shape[0]].set(b2.astype(jnp.float32))
    y = _ffn_call(x, w1.astype(dt), w2.astype(dt),
                  dwk.reshape(9, HID).astype(dt), consts, H, W,
                  interpret=interpret)
    return y, (x, w1, b1, dwk, dwb, w2, b2)


def _ffn_bwd(H, W, res, ct):
    x, w1, b1, dwk, dwb, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _ffn_ref(*a, H, W), x, w1, b1, dwk, dwb, w2, b2)
    return vjp(ct)


pvt2ffn_fused.defvjp(_ffn_fwd, _ffn_bwd)
