"""In-place 2-D directional scan — the fused NHWC quad-scan primitive.

TPU-native replacement for the reference's CrossScan_k + selective-scan +
CrossMerge_k pipeline (gm-unet/model/gm/csms6s.py:56-206 + the CUDA scan,
gm-unet/model/gm/groupmamba.py:99-146): instead of materializing each scan
direction as a channel-first (B, C, L) copy, the first-order recurrence is
evaluated *in the natural channel-last layout* with the pixel ordering of
the direction baked into the kernel:

- direction 1 (row-major fwd)  : W-level lane-shift doubling scan inside
  each image row of the (H, W*C) view, then an H-level sublane doubling
  scan of row summaries, then a fold (two-level scan — exact, no
  exp/rescale tricks);
- direction 2 (col-major fwd)  : the transpose ordering, computed with the
  roles of the two levels swapped — NO data transpose anywhere;
- directions 3/4: the same two kernels run backward (shift directions
  flipped) — NO flips in HBM.

Outputs land in pixel order, so the 4-direction "merge" of the reference
becomes a plain sum — layout cost of the whole cross-scan machinery: zero.

The custom VJP uses the mathematical adjoint of a first-order linear scan:
with g_t = gy_t + a_{t+1} g_{t+1} (a backward scan in the direction's pixel
order), da_t = g_t * h_{t-1} and db_t = g_t. The backward scan reuses the
same kernel with the direction reversed (the reverse of each of the 4
directions is again one of the 4 orderings).

fp32 in/out (decay products need fp32; the surrounding elementwise prologue
and epilogue are XLA-fused and cast at the module level).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# direction codes follow ops/cross_scan.py (reference CrossScan_1..4):
#   1: row-major fwd, 2: col-major fwd, 3: row-major bwd, 4: col-major bwd
_REVERSE_DIR = {1: 3, 3: 1, 2: 4, 4: 2}


def _use_merged() -> bool:
    """Gate (CEIGM_MERGESCAN, default ON): run all K groups of a quad
    block in ONE pallas call (grid (B,)) instead of K per-group calls.
    Hardware A/B @ b128 224sq bf16: 91.05 -> 87.52 ms (+4.0%). Read at
    trace time by the sscan_quad_ln* wrappers (NOT inside the jitted
    kernel builder — the env must be a static arg so A/B flips
    retrace)."""
    import os
    return os.environ.get("CEIGM_MERGESCAN", "1") == "1"


def _doubling_sub(a, b, size, backward):
    """Inclusive doubling scan along the sublane axis of (S, lanes)."""
    k = 1
    while k < size:
        ones = jnp.ones((k, a.shape[1]), jnp.float32)
        zeros = jnp.zeros((k, b.shape[1]), jnp.float32)
        if backward:
            a_sh = jnp.concatenate([a[k:], ones], axis=0)
            b_sh = jnp.concatenate([b[k:], zeros], axis=0)
        else:
            a_sh = jnp.concatenate([ones, a[:-k]], axis=0)
            b_sh = jnp.concatenate([zeros, b[:-k]], axis=0)
        b = b + a * b_sh
        a = a * a_sh
        k *= 2
    return a, b


def _doubling_lane(a, b, W, C, backward):
    """Inclusive doubling scan over W on (S, W*C) arrays: a lane shift by
    k*C moves pixel w -> w+k for every channel."""
    k = 1
    while k < W:
        S = a.shape[0]
        ones = jnp.ones((S, k * C), jnp.float32)
        zeros = jnp.zeros((S, k * C), jnp.float32)
        if backward:
            a_sh = jnp.concatenate([a[:, k * C:], ones], axis=1)
            b_sh = jnp.concatenate([b[:, k * C:], zeros], axis=1)
        else:
            a_sh = jnp.concatenate([ones, a[:, :-k * C]], axis=1)
            b_sh = jnp.concatenate([zeros, b[:, :-k * C]], axis=1)
        b = b + a * b_sh
        a = a * a_sh
        k *= 2
    return a, b


def _rowmajor(a, b, H, W, C, backward):
    """Row-major-order scan on the (H, W*C) view (direction 1 / 3)."""
    a1, b1 = _doubling_lane(a, b, W, C, backward)
    # row summaries sit at w = W-1 (fwd) / w = 0 (bwd). Mosaic can't consume
    # non-zero lane-offset slices downstream -> roll summaries to offset 0.
    if backward:
        a_sum, b_sum = a1[:, :C], b1[:, :C]
    else:
        a_sum = pltpu.roll(a1, C, 1)[:, :C]
        b_sum = pltpu.roll(b1, C, 1)[:, :C]
    _, b2 = _doubling_sub(a_sum, b_sum, H, backward)
    # exclusive prefix per row
    if backward:
        pre = jnp.concatenate([b2[1:], jnp.zeros((1, C), jnp.float32)], 0)
    else:
        pre = jnp.concatenate([jnp.zeros((1, C), jnp.float32), b2[:-1]], 0)
    return b1 + a1 * jnp.tile(pre, (1, W))


def _row_select(x, row):
    """(S, lanes) -> (1, lanes): row `row`, materialized at offset 0.

    A sublane roll+slice leaves the result at a non-zero sublane offset,
    which Mosaic cannot feed into downstream lane concats ("offset mismatch
    on non-concat dimension") — a masked sum reduction lands canonically.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.sum(jnp.where(idx == row, x, 0.0), axis=0, keepdims=True)


def _colmajor(a, b, H, W, C, backward):
    """Column-major-order scan on the (H, W*C) view (direction 2 / 4)."""
    a1, b1 = _doubling_sub(a, b, H, backward)
    if backward:
        a_sum, b_sum = a1[0:1], b1[0:1]
    else:
        a_sum = _row_select(a1, H - 1)
        b_sum = _row_select(b1, H - 1)
    _, b2 = _doubling_lane(a_sum, b_sum, W, C, backward)
    # exclusive prefix per column
    if backward:
        pre = jnp.concatenate(
            [b2[:, C:], jnp.zeros((1, C), jnp.float32)], axis=1)
    else:
        pre = jnp.concatenate(
            [jnp.zeros((1, C), jnp.float32), b2[:, :-C]], axis=1)
    return b1 + a1 * jnp.broadcast_to(pre, (H, W * C))


def _kernel(H, W, C, direction, a_ref, b_ref, out_ref):
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    if direction in (1, 3):
        h = _rowmajor(a, b, H, W, C, backward=(direction == 3))
    else:
        h = _colmajor(a, b, H, W, C, backward=(direction == 4))
    out_ref[...] = h


def _pad_c(C: int) -> int:
    """Smallest lane-friendly channel count >= C: the in-kernel lane
    shifts/rolls/tiles operate at stride C and only canonicalize when C
    divides 128 (or is a multiple of it)."""
    if C % 128 == 0 or 128 % C == 0:
        return C
    if C < 128:
        return next(d for d in (1, 2, 4, 8, 16, 32, 64, 128) if d >= C)
    return -(-C // 128) * 128


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "direction", "interpret"))
def _scan2d_kernel(a, b, H, W, direction, interpret=False):
    """(B, H*W, C) fp32 -> scanned h in pixel order, via one Pallas call."""
    B, L, C0 = a.shape
    C = _pad_c(C0)
    if C != C0:
        # pad with the scan identity (a=1, b=0); sliced off at the end
        a = jnp.pad(a, ((0, 0), (0, 0), (0, C - C0)), constant_values=1.0)
        b = jnp.pad(b, ((0, 0), (0, 0), (0, C - C0)))
    a = a.reshape(B, H, W * C)
    b = b.reshape(B, H, W * C)
    out = pl.pallas_call(
        functools.partial(_kernel, H, W, C, direction),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, H, W * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((None, H, W * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a, b)
    return out.reshape(B, L, C)[..., :C0]


def _to_cm(x, H, W):
    """(B, H*W, C) row-major -> column-major flat order."""
    B, L, C = x.shape
    return jnp.swapaxes(x.reshape(B, H, W, C), 1, 2).reshape(B, L, C)


def _from_cm(x, H, W):
    B, L, C = x.shape
    return jnp.swapaxes(x.reshape(B, W, H, C), 1, 2).reshape(B, L, C)


def _shift_flat(x, forward, fill):
    """x[t] <- x[t+1] (forward=True) or x[t-1], `fill` at the open end."""
    B, L, C = x.shape
    pad = jnp.full((B, 1, C), fill, x.dtype)
    if forward:
        return jnp.concatenate([x[:, 1:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :-1]], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def scan2d(a, b, H, W, direction):
    """h_t = a_t * h_{t-1} + b_t along scan `direction` (1..4), in place.

    a, b: (B, H*W, C) fp32 in row-major pixel order, channel-last. The
    recurrence runs over pixels in the direction's ordering; h is returned
    in row-major pixel order (i.e. scan + merge-layout in one op).
    """
    return _scan2d_fwd(a, b, H, W, direction)[0]


def _scan2d_fwd(a, b, H, W, direction):
    interpret = jax.default_backend() != "tpu"
    h = _scan2d_kernel(a, b, H, W, direction, interpret=interpret)
    return h, (a, h)


def _scan2d_bwd(H, W, direction, res, gh):
    a, h = res
    interpret = jax.default_backend() != "tpu"
    rev = _REVERSE_DIR[direction]
    if direction in (1, 3):
        # row-major storage == scan order: flat shifts suffice
        fwd = direction == 1
        a_next = _shift_flat(a, forward=fwd, fill=1.0)
        g = _scan2d_kernel(a_next, gh, H, W, rev, interpret=interpret)
        h_prev = _shift_flat(h, forward=not fwd, fill=0.0)
    else:
        # column-major order: do the adjoint in the transposed flat layout
        # (channel-last (H, W) swap — cheap, backward-only)
        fwd = direction == 2
        a_cm = _to_cm(a, H, W)
        a_next = _shift_flat(a_cm, forward=fwd, fill=1.0)
        gh_cm = _to_cm(gh, H, W)
        # reverse of dir 2 (cm fwd) is cm bwd == row-major bwd (3) in the
        # cm layout; reverse of dir 4 is row-major fwd (1) in the cm layout.
        g_cm = _scan2d_kernel(a_next, gh_cm, W, H,
                              3 if fwd else 1, interpret=interpret)
        g = _from_cm(g_cm, H, W)
        h_cm_prev = _shift_flat(_to_cm(h, H, W), forward=not fwd, fill=0.0)
        h_prev = _from_cm(h_cm_prev, H, W)
    da = g * h_prev
    db = g
    return da, db


scan2d.defvjp(_scan2d_fwd, _scan2d_bwd)


# ---------------------------------------------------------------------------
# Fully-fused directional selective scan (d_state = 1)
#
# The scan2d path materializes fp32 (B, L, C) decay/drive tensors in HBM;
# at stage-1 shapes that HBM traffic costs ~5x the scan itself. This op
# fuses the whole d_state=1 selective-scan pipeline into the direction
# kernel: softplus(dt)+decay+drive construction, the two-level scan, and
# the C*h + D*u output emission all happen in VMEM — HBM sees the four
# low-precision inputs once and the output once (the TPU analogue of the
# reference "ndstate" specialization, selective_scan_ndstate.h:26-58,
# fused through the surrounding elementwise stage as well).
# ---------------------------------------------------------------------------


def _fused_kernel(H, W, C, direction, u_ref, dt_ref, b_ref, c_ref,
                  const_ref, out_ref):
    u = u_ref[...].astype(jnp.float32)
    dt = dt_ref[...].astype(jnp.float32)
    Bv = b_ref[...].astype(jnp.float32)
    Cv = c_ref[...].astype(jnp.float32)
    # const rows (3, C): [A (negative), dt_bias, D] -> lane layout (1, W*C)
    A = jnp.tile(const_ref[0:1, :], (1, W))
    bias = jnp.tile(const_ref[1:2, :], (1, W))
    Dv = jnp.tile(const_ref[2:3, :], (1, W))

    d = jax.nn.softplus(dt + bias)
    a = jnp.exp(d * A)
    b = d * u * Bv
    if direction in (1, 3):
        h = _rowmajor(a, b, H, W, C, backward=(direction == 3))
    else:
        h = _colmajor(a, b, H, W, C, backward=(direction == 4))
    out_ref[...] = (Cv * h + Dv * u).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "direction",
                                             "interpret"))
def _sscan_dir_kernel(u, dt, Bb, Cb, consts, H, W, direction,
                      interpret=False):
    """u, dt, Bb, Cb: (B, H*W, C) any dtype; consts (3, C) fp32 -> y fp32."""
    B, L, C0 = u.shape
    C = _pad_c(C0)
    if C != C0:
        pad3 = ((0, 0), (0, 0), (0, C - C0))
        u = jnp.pad(u, pad3)
        dt = jnp.pad(dt, pad3)
        Bb = jnp.pad(Bb, pad3)
        Cb = jnp.pad(Cb, pad3)
        # A=-1 keeps exp(d*A) <= 1 in padded lanes (no inf/overflow junk)
        consts = jnp.pad(consts, ((0, 0), (0, C - C0)),
                         constant_values=-1.0)
    dty = u.dtype
    view = lambda x: x.reshape(B, H, W * C)
    spec = pl.BlockSpec((None, H, W * C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, H, W, C, direction),
        grid=(B,),
        in_specs=[spec] * 4 + [
            pl.BlockSpec((3, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W * C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(view(u), view(dt), view(Bb), view(Cb), consts)
    return out.reshape(B, L, C)[..., :C0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def sscan_dir(u, dt, Bb, Cb, A, bias, Dv, H, W, direction):
    """Fused d_state=1 selective scan along direction (1..4), in place.

    u, dt, Bb, Cb: (B, H*W, C) (low precision fine — fp32 inside);
    A (negative), bias, Dv: (C,) fp32. Returns fp32
        y = Cb * scan_dir(exp(softplus(dt+bias)*A), softplus(dt+bias)*u*Bb)
            + Dv * u.
    """
    return _sscan_fwd(u, dt, Bb, Cb, A, bias, Dv, H, W, direction)[0]


def _consts(A, bias, Dv):
    return jnp.stack([A.astype(jnp.float32), bias.astype(jnp.float32),
                      Dv.astype(jnp.float32)])


def _sscan_fwd(u, dt, Bb, Cb, A, bias, Dv, H, W, direction):
    interpret = jax.default_backend() != "tpu"
    y = _sscan_dir_kernel(u, dt, Bb, Cb, _consts(A, bias, Dv), H, W,
                          direction, interpret=interpret)
    return y, (u, dt, Bb, Cb, A, bias, Dv)


def _sscan_bwd(H, W, direction, res, gy):
    u0, dt0, Bb0, Cb0, A, bias, Dv = res
    interpret = jax.default_backend() != "tpu"
    uf = u0.astype(jnp.float32)
    Bf = Bb0.astype(jnp.float32)
    Cf = Cb0.astype(jnp.float32)
    gy = gy.astype(jnp.float32)

    pre = dt0.astype(jnp.float32) + bias.astype(jnp.float32)
    d = jax.nn.softplus(pre)
    a = jnp.exp(d * A.astype(jnp.float32))
    b = d * uf * Bf
    # recompute h (mirrors the CUDA bwd chunk-recompute design)
    h = _scan2d_kernel(a, b, H, W, direction, interpret=interpret)

    gh = Cf * gy
    da, db = _scan2d_bwd(H, W, direction, (a, h), gh)

    dd = db * uf * Bf + (da * a) * A.astype(jnp.float32)
    ddt = dd * jax.nn.sigmoid(pre)
    du = db * d * Bf + Dv.astype(jnp.float32) * gy
    dBb = db * d * uf
    dCb = h * gy
    dA = jnp.sum(da * a * d, axis=(0, 1))
    dbias = jnp.sum(ddt, axis=(0, 1))
    dD = jnp.sum(gy * uf, axis=(0, 1))

    cast = lambda x, r: x.astype(r.dtype)
    return (cast(du, u0), cast(ddt, dt0), cast(dBb, Bb0), cast(dCb, Cb0),
            cast(dA, A), cast(dbias, bias), cast(dD, Dv))


sscan_dir.defvjp(_sscan_fwd, _sscan_bwd)





# ---------------------------------------------------------------------------
# v3: scan + per-pixel group-LayerNorm + z-gate fused in the kernel.
# The LN reductions over each pixel's C lanes are segmented lane sums,
# expressed as two tiny MXU matmuls against an iota-built 0/1 selector —
# the (B, K, L, C) fp32 y tensor never exists in HBM; the kernel emits the
# final gated activation in the input dtype.
# ---------------------------------------------------------------------------


def _seg_mats(W, C):
    """(W*C, W) selector S (S[i,j] = [i//C == j]) and its transpose."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (W * C, W), 0)
    j0 = jax.lax.broadcasted_iota(jnp.int32, (W * C, W), 1)
    S = (i0 // C == j0).astype(jnp.float32)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (W, W * C), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (W, W * C), 1)
    ST = (j1 // C == i1).astype(jnp.float32)
    return S, ST


def _quad_ln_body(H, W, C, true_c, dirn, u, dt, bs, cs, consts,
                  quant=False):
    """Shared scan + group-LN body on one group's (H, W*C) block.

    u/dt (H, W*C) any dtype; bs/cs (H, W) f32 per-pixel scalars; consts
    (>=5, C) f32 rows [A, dt_bias, D, ln_scale, ln_offset]. With
    ``quant`` u/dt arrive int8 and rows 5/6 hold their per-lane
    dequantization scales (amax/127). Returns the normalized activation
    (H, W*C) f32."""
    u = u.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    if quant:
        u = u * jnp.tile(consts[5:6, :], (1, W))
        dt = dt * jnp.tile(consts[6:7, :], (1, W))
    A = jnp.tile(consts[0:1, :], (1, W))
    bias = jnp.tile(consts[1:2, :], (1, W))
    Dv = jnp.tile(consts[2:3, :], (1, W))
    ln_s = jnp.tile(consts[3:4, :], (1, W))
    ln_b = jnp.tile(consts[4:5, :], (1, W))

    # per-pixel scalar B/C maps (H, W) -> (H, W*C) via the selector matmul
    # (passing them pre-broadcast costs two (B,K,L,C) HBM copies at the
    # pallas layout boundary — traced at ~0.4 ms per quad block)
    _, ST = _seg_mats(W, C)
    expand = lambda s: jax.lax.dot_general(
        s.astype(jnp.float32), ST, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    Bv = expand(bs)
    Cv = expand(cs)

    d = jax.nn.softplus(dt + bias)
    a = jnp.exp(d * A)
    b = d * u * Bv
    if dirn in (1, 3):
        h = _rowmajor(a, b, H, W, C, backward=(dirn == 3))
    else:
        h = _colmajor(a, b, H, W, C, backward=(dirn == 4))
    y = Cv * h + Dv * u

    # group-LN over each pixel's C lanes (segmented matmul reductions)
    S, _ = _seg_mats(W, C)
    dot = lambda x, m: jax.lax.dot_general(
        x, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    inv = 1.0 / float(true_c)
    m = dot(y, S) * inv
    v = dot(y * y, S) * inv - m * m
    mb = dot(m, ST)
    ivb = dot(jax.lax.rsqrt(v + 1e-5), ST)
    return (y - mb) * ivb * ln_s + ln_b


def _fused_quad_ln_kernel(H, W, C, true_c, dirn, quant, u_ref, dt_ref,
                          bs_ref, cs_ref, const_ref, out_ref):
    out_ref[...] = _quad_ln_body(
        H, W, C, true_c, dirn, u_ref[...], dt_ref[...], bs_ref[...],
        cs_ref[...], const_ref[...], quant).astype(out_ref.dtype)


def _fused_quad_ln_merged_kernel(H, W, C, true_c, directions, G, quant,
                                 u_ref, dt_ref, bs_ref, cs_ref, const_ref,
                                 *out_refs):
    """All K groups of G images per grid step — one pallas launch per
    quad block instead of K*B (kills per-call/per-step fixed costs and
    lets the group DMAs pipeline behind each other's compute). G > 1
    amortizes the ~1.5-2 us/grid-step fixed cost at the small-spatial
    stages where a single image's block is tiny."""
    for i in range(G):
        for g, dirn in enumerate(directions):
            out_refs[g][i] = _quad_ln_body(
                H, W, C, true_c, int(dirn), u_ref[i, g], dt_ref[i, g],
                bs_ref[i, g], cs_ref[i, g],
                const_ref[g], quant).astype(out_refs[g].dtype)


def _merged_g(B, K, H, WC, dtype_size):
    """Images per grid step for the merged kernel: grow G while a
    step's u-block stays under ~2 MiB, capped at 8 and at divisors of B
    (CEIGM_SCAN_G overrides). Hardware sweep (b128 224sq): policy@1MiB
    86.99 ms, G=4 global 86.74, G=8 global 86.78 — the 2 MiB cap lands
    stage 1 on G=4 and the small-spatial stages on G=8."""
    import os
    v = os.environ.get("CEIGM_SCAN_G", "")
    if v.isdigit() and B % max(int(v), 1) == 0:
        return max(int(v), 1)
    img = K * H * WC * dtype_size
    G = 1
    while G < 8 and B % (G * 2) == 0 and (G * 2) * img <= (2 << 20):
        G *= 2
    return G


@functools.partial(jax.jit, static_argnames=("H", "W", "directions",
                                             "true_c", "interpret",
                                             "merged", "quant"))
def _sscan_quad_ln_kernel(u, dt, Bs, Cs, consts, H, W, directions,
                          true_c=None, interpret=False, merged=False,
                          quant=False):
    """Scan + group-LN fused; Bs/Cs are per-pixel scalars (B, K, L).

    ``true_c``: real channel count per group when the caller hands lanes
    already zero-padded past it (wide-lane stage mode) — the group-LN
    statistics divide by ``true_c``, and the pad lanes (zero in u, dt,
    and the ln scale/offset rows of ``consts``) emit exact zeros.
    """
    B, K, L, C0 = u.shape
    true_c = true_c or C0
    C = _pad_c(C0)
    if C != C0:
        pad4 = ((0, 0), (0, 0), (0, 0), (0, C - C0))
        u = jnp.pad(u, pad4)
        dt = jnp.pad(dt, pad4)
        consts = jnp.pad(consts, ((0, 0), (0, 0), (0, C - C0)),
                         constant_values=-1.0)
    consts = jnp.pad(jnp.swapaxes(consts, 0, 1),
                     ((0, 0), (0, 8 - consts.shape[0]), (0, 0)))
    uv = u.reshape(B, K, H, W * C)
    dtv = dt.reshape(B, K, H, W * C)
    bsv = Bs.reshape(B, K, H, W).astype(jnp.float32)
    csv = Cs.reshape(B, K, H, W).astype(jnp.float32)

    if merged:
        G = _merged_g(B, K, H, W * C, u.dtype.itemsize)
        spec = pl.BlockSpec((G, K, H, W * C), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((G, K, H, W), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((G, H, W * C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct(
            (B, H, W * C), jnp.bfloat16 if quant else u.dtype)
        ys = pl.pallas_call(
            functools.partial(_fused_quad_ln_merged_kernel, H, W, C,
                              true_c, tuple(int(d) for d in directions),
                              G, quant),
            grid=(B // G,),
            in_specs=[spec, spec, sspec, sspec,
                      pl.BlockSpec((K, 8, C), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[ospec] * K,
            out_shape=[oshape] * K,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(uv, dtv, bsv, csv, consts)
        return [y.reshape(B, L, C)[..., :C0] for y in ys]

    outs = []
    for g, dirn in enumerate(directions):
        spec = pl.BlockSpec((None, None, H, W * C),
                            lambda i, g=g: (i, g, 0, 0),
                            memory_space=pltpu.VMEM)
        sspec = pl.BlockSpec((None, None, H, W), lambda i, g=g: (i, g, 0, 0),
                             memory_space=pltpu.VMEM)
        y = pl.pallas_call(
            functools.partial(_fused_quad_ln_kernel, H, W, C, true_c,
                              int(dirn), quant),
            grid=(B,),
            in_specs=[spec, spec, sspec, sspec,
                      pl.BlockSpec((None, 8, C), lambda i, g=g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((None, H, W * C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (B, H, W * C), jnp.bfloat16 if quant else u.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(uv, dtv, bsv, csv, consts)
        outs.append(y.reshape(B, L, C)[..., :C0])
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def sscan_quad_ln(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, directions,
                  true_c=None):
    """Fused scan + group-LN. ln = (scale, offset) each (K, C);
    Bs, Cs: (B, K, H*W) per-pixel input/output scalars (d_state = 1).

    Returns the normalized (ungated) activation, group-planar
    (B, K, H*W, C) in u.dtype, pixel-ordered.

    ``true_c``: real channels per group when the last axis is handed in
    already zero-padded past it (wide-lane stages): u/dt pad lanes must
    be zero, A pad entries -1, bias/Dv/ln pads 0 — the LN statistics
    then divide by ``true_c`` and the pad lanes emit exact zeros.
    """
    return _sscan_quad_ln_fwd(u, dt, Bs, Cs, A, bias, Dv, ln,
                              H, W, directions, true_c)[0]


def _sscan_quad_ln_fwd(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, directions,
                       true_c=None):
    interpret = jax.default_backend() != "tpu"
    ln_s, ln_b = ln
    consts = jnp.stack([A.astype(jnp.float32), bias.astype(jnp.float32),
                        Dv.astype(jnp.float32), ln_s.astype(jnp.float32),
                        ln_b.astype(jnp.float32)])
    outs = _sscan_quad_ln_kernel(u, dt, Bs, Cs, consts, H, W,
                                 tuple(directions), true_c=true_c,
                                 interpret=interpret, merged=_use_merged())
    out = jnp.stack(outs, axis=1)
    return out, (u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b)


def _sscan_quad_ln_bwd(H, W, directions, true_c, res, go):
    return _quad_ln_bwd_impl(H, W, directions, true_c, res,
                             [go[:, k] for k in range(len(directions))])


def _quad_ln_bwd_impl(H, W, directions, true_c, res, go_slices):
    """Recompute-based backward: h via the scan kernel, LN backward in
    XLA, then the scan adjoint via the reversed-direction kernel.
    With ``true_c`` set, the LN statistic divisors use the true lane
    count (pad lanes hold zeros — see the fwd docstring).
    ``go_slices``: per-group (B, L, C) output cotangents."""
    u0, dt0, Bs0, Cs0, A, bias, Dv, ln_s, ln_b = res
    interpret = jax.default_backend() != "tpu"
    eps = 1e-5
    inv_c = 1.0 / float(true_c or u0.shape[-1])
    tmean = lambda x: jnp.sum(x, axis=-1, keepdims=True) * inv_c

    per = {k: [] for k in ("du", "ddt", "dBs", "dCs",
                           "dA", "dbias", "dD", "ds", "dt2")}
    for k, dirn in enumerate(directions):
        u = u0[:, k].astype(jnp.float32)
        dt = dt0[:, k].astype(jnp.float32)
        Bf = Bs0[:, k].astype(jnp.float32)[..., None]   # (B, L, 1)
        Cf = Cs0[:, k].astype(jnp.float32)[..., None]
        g = go_slices[k].astype(jnp.float32)

        pre = dt + bias[k]
        d = jax.nn.softplus(pre)
        a = jnp.exp(d * A[k])
        b = d * u * Bf
        h = _scan2d_kernel(a, b, H, W, dirn, interpret=interpret)
        y = Cf * h + Dv[k] * u

        mu = tmean(y)
        var = tmean(y * y) - mu * mu
        ir = jax.lax.rsqrt(var + eps)
        yn = (y - mu) * ir

        # affine backward
        per["ds"].append(jnp.sum(g * yn, axis=(0, 1)))
        per["dt2"].append(jnp.sum(g, axis=(0, 1)))
        dyn = g * ln_s[k]
        dy = ir * (dyn - tmean(dyn) - yn * tmean(dyn * yn))

        # y = C*h + D*u
        per["dCs"].append(jnp.sum(h * dy, axis=-1))
        per["dD"].append(jnp.sum(u * dy, axis=(0, 1)))
        gh = Cf * dy
        da, db = _scan2d_bwd(H, W, dirn, (a, h), gh)

        dd = db * u * Bf + (da * a) * A[k]
        ddt = dd * jax.nn.sigmoid(pre)
        per["du"].append(db * d * Bf + Dv[k] * dy)
        per["dBs"].append(jnp.sum(db * d * u, axis=-1))
        per["dA"].append(jnp.sum(da * a * d, axis=(0, 1)))
        per["dbias"].append(jnp.sum(ddt, axis=(0, 1)))
        per["ddt"].append(ddt)

    stk1 = lambda xs: jnp.stack(xs, axis=1)
    stk0 = lambda xs: jnp.stack(xs, axis=0)
    cast = lambda x, r: x.astype(r.dtype)
    return (cast(stk1(per["du"]), u0), cast(stk1(per["ddt"]), dt0),
            cast(stk1(per["dBs"]), Bs0), cast(stk1(per["dCs"]), Cs0),
            stk0(per["dA"]), stk0(per["dbias"]), stk0(per["dD"]),
            (stk0(per["ds"]), stk0(per["dt2"])))


sscan_quad_ln.defvjp(_sscan_quad_ln_fwd, _sscan_quad_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def sscan_quad_ln_cat(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, directions,
                      true_c=None):
    """:func:`sscan_quad_ln`, but the per-direction outputs are
    lane-concatenated to (B, H*W, K*C) — the exact layout the gated
    out-projection GEMM consumes. This skips the group-planar
    (B, K, L, C) stack + swapaxes round trip the v3 API forces on the
    model side (~two 25 MB relayout passes per quad call at stage 1,
    r3 trace)."""
    return _sscan_quad_ln_cat_fwd(u, dt, Bs, Cs, A, bias, Dv, ln,
                                  H, W, directions, true_c)[0]


def _sscan_quad_ln_cat_fwd(u, dt, Bs, Cs, A, bias, Dv, ln, H, W,
                           directions, true_c=None):
    interpret = jax.default_backend() != "tpu"
    ln_s, ln_b = ln
    consts = jnp.stack([A.astype(jnp.float32), bias.astype(jnp.float32),
                        Dv.astype(jnp.float32), ln_s.astype(jnp.float32),
                        ln_b.astype(jnp.float32)])
    outs = _sscan_quad_ln_kernel(u, dt, Bs, Cs, consts, H, W,
                                 tuple(directions), true_c=true_c,
                                 interpret=interpret, merged=_use_merged())
    out = jnp.concatenate(outs, axis=-1)
    return out, (u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b)


def _sscan_quad_ln_cat_bwd(H, W, directions, true_c, res, go):
    C = res[0].shape[-1]
    return _quad_ln_bwd_impl(
        H, W, directions, true_c, res,
        [go[..., k * C:(k + 1) * C] for k in range(len(directions))])


sscan_quad_ln_cat.defvjp(_sscan_quad_ln_cat_fwd, _sscan_quad_ln_cat_bwd)


def sscan_quad_ln_cat_q8(u_q, dt_q, su, sdt, Bs, Cs, A, bias, Dv, ln,
                         H, W, directions):
    """:func:`sscan_quad_ln_cat` with int8-quantized u/dt operands —
    the sub-bf16 activation-storage experiment (r3 verdict #2): the
    (B, K, L, C) boundary tensors (and the relayout copies they pay on
    the way in) move half the bytes. ``su``/``sdt``: per-lane (K, C)
    dequantization scales (amax/127); applied in-kernel before the
    softplus/decay prologue, so the math past dequantization is
    identical to the bf16 path. FORWARD ONLY (no VJP): gated by
    CEIGM_QUANT for inference measurement; training keeps bf16."""
    interpret = jax.default_backend() != "tpu"
    ln_s, ln_b = ln
    consts = jnp.stack([A.astype(jnp.float32), bias.astype(jnp.float32),
                        Dv.astype(jnp.float32), ln_s.astype(jnp.float32),
                        ln_b.astype(jnp.float32), su.astype(jnp.float32),
                        sdt.astype(jnp.float32)])
    outs = _sscan_quad_ln_kernel(u_q, dt_q, Bs, Cs, consts, H, W,
                                 tuple(directions), interpret=interpret,
                                 merged=_use_merged(), quant=True)
    return jnp.concatenate(outs, axis=-1)

