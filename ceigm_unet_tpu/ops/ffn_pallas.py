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


def _ffn_mask_chunk(L, W, C, dtype):
    """(L, C) tap-validity block: column t < 9 holds m_t(p) = 1 where the
    (dy, dx) = (t//3-1, t%3-1) tap's source pixel p + dy*W + dx is inside
    the image; columns >= 9 are zero. Matmul'ed against rows b1*k_t this
    reproduces fc1's bias flowing through the zero-padded depthwise conv
    EXACTLY (interior pixels see b1*sum(k); edge pixels see fewer taps)."""
    H = L // W
    p = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (L, C), 1)
    py, px = p // W, p % W
    dy, dx = c // 3 - 1, c % 3 - 1
    ok = ((c < 9)
          & (py + dy >= 0) & (py + dy < H)
          & (px + dx >= 0) & (px + dx < W))
    return ok.astype(dtype)


def _ffn_mm_kernel(L, W, G, C, x_ref, w1s_ref, w2_ref, consts_ref,
                   out_ref):
    """Matmul-first fused PVT2FFN: fc1 and the depthwise 3x3 are ONE
    GEMM over shifted copies of the NARROW (L, C) input.

    dw3x3(x @ W1)[p] = sum_t (x[p+t] @ W1) * k_t = sum_t shift_t(x) @
    (W1 * k_t) — a 3x3 *full* conv with per-tap weight matrices. The
    shifts move C lanes instead of HID (8x less VPU move traffic than
    the hidden-shift formulation this replaces, which lost its model A/B
    by running the taps as 9 wide fp32 FMAs on the VPU — same lesson as
    the LGAG matmul-first rewrite, commit 2db59f5), and the tap
    reduction runs on the MXU with full 128-lane K tiles: chunks
    [shift_0(x) .. shift_8(x), maskblk] each (L, C) are lane-concatenated
    in groups of 128//C and matmul'ed against the stacked (10*C, HID)
    weight, accumulating in fp32. Cost: ~10x fc1's FLOPs on the MXU
    (~0.17 ms/image-block at stage-1 b=1) against the ~1.4 ms/block HBM
    mega-fusion it displaces; the hidden tensor never exists in HBM.

    consts rows: [dwb, b2-in-head]."""
    w2 = w2_ref[...]
    maskblk = _ffn_mask_chunk(L, W, C, x_ref.dtype)
    mm = _col_mask(L, W, -1).astype(x_ref.dtype)
    mp = _col_mask(L, W, 1).astype(x_ref.dtype)
    w1s = w1s_ref[...]
    for g in range(G):
        x = x_ref[g].reshape(L, C)
        chunks = []
        for t in range(9):
            dy, dx = t // 3 - 1, t % 3 - 1
            cm = mm if dx < 0 else (mp if dx > 0 else None)
            sh = _shift_sub(x, dy * W + dx)
            chunks.append(sh if cm is None else sh * cm)
        chunks.append(maskblk)
        # one 10*C-wide operand, one full-K-tile GEMM (fp32 accumulate)
        x10 = jnp.concatenate(chunks, axis=1)
        acc = jax.lax.dot_general(x10, w1s, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        gact = fast_gelu(acc + consts_ref[0:1, :])
        o = jax.lax.dot_general(gact.astype(w2.dtype), w2,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[g] = (o + consts_ref[1:2, :out_ref.shape[3]]).astype(
            out_ref.dtype).reshape(out_ref.shape[1:3] + (C,))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_mm_call(x, w1s, w2, consts, interpret=False):
    """x: 4-D NHWC (B, H, W, C) — the kernel consumes the model's native
    layout directly (a (B, L, C) boundary costs ~2 ms of relayout copies
    model-wide, r4 trace) and flattens H, W inside VMEM."""
    B, H, W, C = x.shape
    L = H * W
    HID = w2.shape[0]
    # images per grid step: amortize the ~1.5 us/step fixed cost while
    # keeping the fp32 hidden accumulator under ~32 MiB of VMEM
    G = 1
    hid_bytes = L * HID * 4
    while G < 8 and B % (G * 2) == 0 and (G * 2) * hid_bytes <= (32 << 20):
        G *= 2
    spec_x = pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_mm_kernel, L, W, G, C),
        grid=(B // G,),
        in_specs=[
            spec_x,
            pl.BlockSpec((10 * C, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HID), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1s, w2, consts)


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


@jax.custom_vjp
def pvt2ffn_fused(x, w1, b1, dwk, dwb, w2, b2):
    """Fused fc1 -> dw3x3 -> GELU -> fc2 on NHWC (B, H, W, C) input.

    w1 (C, HID), b1 (HID), dwk (3, 3, 1, HID), dwb (HID), w2 (HID, C),
    b2 (C). Returns (B, H, W, C) in x.dtype. The hidden tensor stays in
    VMEM (never hits HBM); backward recomputes through the XLA
    composition.
    """
    return _ffn_fwd(x, w1, b1, dwk, dwb, w2, b2)[0]


def _ffn_fwd(x, w1, b1, dwk, dwb, w2, b2):
    import os
    interpret = jax.default_backend() != "tpu"
    HID = w1.shape[1]
    B, H, W, C = x.shape
    dt = x.dtype
    # C >= 16: the bias-mask chunk pads b1*k_t (9 rows) up to C rows —
    # narrower channel counts can't hold the 9 tap columns (the pad
    # would be negative); matches models/layers.py:_mm_ffn_eligible
    mm_ok = C >= 16 and ((C % 128 == 0) or (C <= 128 and 128 % C == 0))
    if mm_ok and os.environ.get("CEIGM_FFN_MM", "1") == "1":
        # matmul-first formulation: stacked tap weights (10*C, HID) —
        # rows [t*C:(t+1)*C] = W1 * k_t; rows [9*C + t] = b1 * k_t (the
        # mask chunk's bias rows); remaining tail rows zero
        k9 = dwk.reshape(9, HID).astype(jnp.float32)
        w1f = w1.astype(jnp.float32)
        w1s = jnp.concatenate(
            [w1f * k9[t:t + 1, :] for t in range(9)]
            + [jnp.pad(b1.astype(jnp.float32)[None, :] * k9,
                       ((0, C - 9), (0, 0)))], axis=0)
        consts = jnp.zeros((2, HID), jnp.float32)
        consts = consts.at[0, :].set(dwb.astype(jnp.float32))
        consts = consts.at[1, :b2.shape[0]].set(b2.astype(jnp.float32))
        y = _ffn_mm_call(x, w1s.astype(dt), w2.astype(dt), consts,
                         interpret=interpret)
        return y, (x, w1, b1, dwk, dwb, w2, b2)
    consts = jnp.zeros((3, HID), jnp.float32)
    consts = consts.at[0, :].set(b1.astype(jnp.float32))
    consts = consts.at[1, :].set(dwb.astype(jnp.float32))
    consts = consts.at[2, :b2.shape[0]].set(b2.astype(jnp.float32))
    y = _ffn_call(x.reshape(B, H * W, C), w1.astype(dt), w2.astype(dt),
                  dwk.reshape(9, HID).astype(dt), consts, H, W,
                  interpret=interpret)
    return y.reshape(B, H, W, C), (x, w1, b1, dwk, dwb, w2, b2)


def _ffn_bwd(res, ct):
    x, w1, b1, dwk, dwb, w2, b2 = res
    B, H, W, C = x.shape
    _, vjp = jax.vjp(
        lambda xf, *a: _ffn_ref(xf, *a, H, W).reshape(B, H, W, C),
        x.reshape(B, H * W, C), w1, b1, dwk, dwb, w2, b2)
    outs = vjp(ct)
    return (outs[0].reshape(B, H, W, C),) + tuple(outs[1:])


pvt2ffn_fused.defvjp(_ffn_fwd, _ffn_bwd)
