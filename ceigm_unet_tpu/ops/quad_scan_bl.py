"""Batch-LAST quad scan — the r5 layout-restructure kernel family.

Motivation (docs/STATUS.md r4 copy attribution): XLA's GEMM/conv
emitters lay every activation out batch-MINOR (batch in the lanes),
while the row-major layouts the (B, K, L, D) quad kernels pin force a
full lane<->sublane relayout of u and dt (each materializes ~3x) at
every scan boundary — 25 ms of pure layout at b128. These kernels flip
the KERNEL's geometry instead of fighting XLA's: operands are logically
batch-last —

    u, dt : (K, D, L, B)   per (group, channel) an (L, B) plane,
    Bs, Cs: (K, 1, L, B)   per-pixel scalars,
    out   : (K*D, L, B)    lane-concatenated for the transposed gate GEMM

— so the row-major view Mosaic requires has B in the lanes, exactly
where the surrounding GEMMs already put it. Structural wins over the
(B, K, L, D) kernels (ops/quad_scan.py):

- lanes hold the BATCH (128 at the headline b128 batch: full lane
  tiles), channels sit in an untiled outer block dim — so stage 3's
  D=87 pays no lane padding (the old kernel padded 87->128 lanes),
  and no selector matmuls / pltpu.roll lane tricks are needed anywhere:
  every shift in the doubling scans is a sublane or outer-dim concat;
- the scan runs over L in the sublane/outer dims: row-major directions
  are ONE flat doubling chain over L; column-major ones a two-level
  (H outer, W sublane) chain — both chunked over the grid with a
  carried (D, 1, B) scan state (the chunk-prefix design of
  ops/scan_pallas.py), so VMEM holds only an L-slice per step;
- the fused epilogue (C*h + D*u, group-LN over D) reduces over the
  OUTER channel dim — plain accumulation, no segmented matmuls.

Reference parity: same math as sscan_quad_ln_cat (d_state=1 selective
scan, reference ndstate specialization selective_scan_ndstate.h:26-58 +
CrossScan/Merge csms6s.py:56-206); differentially tested against the
(B, K, L, D) path in tests/test_quad_bl.py.

Differentiable: a recompute-based custom VJP mirrors the established
backward (_sscan_quad_ln_cat_bwd) with plain batch-last scan kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dbl(a, b, n, axis, backward):
    """Inclusive doubling scan along ``axis`` (any block dim) via
    concat-shifts; returns (prefix products a, prefix scan b)."""
    k = 1
    while k < n:
        sl_lo = [slice(None)] * a.ndim
        sl_hi = [slice(None)] * a.ndim
        sl_lo[axis] = slice(0, a.shape[axis] - k)
        sl_hi[axis] = slice(k, None)
        fill = list(a.shape)
        fill[axis] = k
        ones = jnp.ones(fill, jnp.float32)
        zeros = jnp.zeros(fill, jnp.float32)
        if backward:
            a_sh = jnp.concatenate([a[tuple(sl_hi)], ones], axis=axis)
            b_sh = jnp.concatenate([b[tuple(sl_hi)], zeros], axis=axis)
        else:
            a_sh = jnp.concatenate([ones, a[tuple(sl_lo)]], axis=axis)
            b_sh = jnp.concatenate([zeros, b[tuple(sl_lo)]], axis=axis)
        b = b + a * b_sh
        a = a * a_sh
        k *= 2
    return a, b


def _select(x, axis, idx):
    """x[..., idx, ...] along ``axis`` with keepdims, landed at offset 0
    (masked reduction — Mosaic-canonical, like quad_scan._row_select)."""
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.sum(jnp.where(pos == idx, x, 0.0), axis=axis,
                   keepdims=True)


def _excl(x, axis, backward, fill):
    """Exclusive shift by one along ``axis``."""
    sh = list(x.shape)
    sh[axis] = 1
    pad = jnp.full(sh, fill, jnp.float32)
    sl = [slice(None)] * x.ndim
    if backward:
        sl[axis] = slice(1, None)
        return jnp.concatenate([x[tuple(sl)], pad], axis=axis)
    sl[axis] = slice(0, x.shape[axis] - 1)
    return jnp.concatenate([pad, x[tuple(sl)]], axis=axis)


def _prologue(u_ref, dt_ref, bs_ref, c_ref):
    """softplus/decay/drive from the raw block operands. consts c_ref
    rows: [A, dt_bias, D, ln_scale, ln_offset], each (D, 1[, 1], B)."""
    u = u_ref[...].astype(jnp.float32)
    dt = dt_ref[...].astype(jnp.float32)
    bs = bs_ref[...].astype(jnp.float32)
    A = c_ref[0]
    bias = c_ref[1]
    d = jax.nn.softplus(dt + bias)
    a = jnp.exp(d * A)
    b = d * u * bs
    return u, a, b


def _epilogue(u, h, cs_ref, c_ref, true_c, out_ref):
    """y = C*h + D*u, then group-LN over the channel (outer) dim."""
    y = cs_ref[...].astype(jnp.float32) * h + c_ref[2] * u
    inv = 1.0 / float(true_c)
    m = jnp.sum(y, axis=0, keepdims=True) * inv
    v = jnp.sum(y * y, axis=0, keepdims=True) * inv - m * m
    out = (y - m) * jax.lax.rsqrt(v + 1e-5) * c_ref[3] + c_ref[4]
    out_ref[...] = out.astype(out_ref.dtype)


def _rm_job(true_c, backward, step, u_ref, dt_ref, bs_ref, cs_ref, c_ref,
            out_ref, carry_ref):
    """Row-major direction on a (D, Lt, B) chunk; carry (D, 1, B)."""
    @pl.when(step == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    u, a, b = _prologue(u_ref, dt_ref, bs_ref, c_ref)
    Lt = u.shape[1]
    aP, hin = _dbl(a, b, Lt, 1, backward)
    h = hin + aP * carry_ref[...]
    carry_ref[...] = _select(h, 1, 0 if backward else Lt - 1)
    _epilogue(u, h, cs_ref, c_ref, true_c, out_ref)


def _cm_job(true_c, backward, step, u_ref, dt_ref, bs_ref, cs_ref, c_ref,
            out_ref, carry_ref):
    """Column-major direction on a (D, H, Wt, B) chunk (chunked over W —
    whole columns per step); carry (D, 1, 1, B)."""
    @pl.when(step == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    u, a, b = _prologue(u_ref, dt_ref, bs_ref, c_ref)
    H, Wt = u.shape[1], u.shape[2]
    # level 1: scan down every column (outer-dim shifts over H)
    a1, b1 = _dbl(a, b, H, 1, backward)
    # level 2: combine column totals across the chunk's Wt columns
    a_sum = _select(a1, 1, 0 if backward else H - 1)
    b_sum = _select(b1, 1, 0 if backward else H - 1)
    a2, b2 = _dbl(a_sum, b_sum, Wt, 2, backward)
    pre_b = _excl(b2, 2, backward, 0.0)
    pre_a = _excl(a2, 2, backward, 1.0)
    hin = b1 + a1 * pre_b
    aP = a1 * pre_a
    h = hin + aP * carry_ref[...]
    last = _select(h, 2, 0 if backward else Wt - 1)
    carry_ref[...] = _select(last, 1, 0 if backward else H - 1)
    _epilogue(u, h, cs_ref, c_ref, true_c, out_ref)


def _multi_body(true_c, backs, is_cm, *refs):
    """All same-family jobs of a quad block in ONE pallas call (the
    (B, K, L, D) kernels' merged-launch lesson: fewer calls, DMAs
    pipeline behind the other job's compute). refs layout:
    [5 ins per job ...][1 out per job ...][1 carry per job ...]."""
    nj = len(backs)
    step = pl.program_id(0)
    job = _cm_job if is_cm else _rm_job
    for j, backward in enumerate(backs):
        job(true_c, backward, step, *refs[5 * j:5 * j + 5],
            refs[5 * nj + j], refs[6 * nj + j])


def _budget() -> int:
    """Per-operand VMEM chunk budget (MiB) for the batch-last kernels;
    CEIGM_BL_BUDGET sweeps it (hardware tuning knob). Read INSIDE the
    jitted call builders — same-process flips do NOT retrace; sweep in
    fresh processes."""
    import os
    return int(os.environ.get("CEIGM_BL_BUDGET", "2")) << 20


def _chunks(L, B, D, itemsize, budget=None):
    """Largest divisor count keeping a (D, Lt, B) operand <= budget.
    Mosaic requires the sublane (second-minor) block dim Lt to be a
    multiple of 8 or the full extent — only halvings that keep Lt % 8
    == 0 are taken."""
    budget = budget or _budget()
    n = 1
    while (L % (n * 2) == 0 and (L // (n * 2)) % 8 == 0
           and (L // n) * B * D * itemsize > budget):
        n *= 2
    return n


@functools.partial(jax.jit, static_argnames=(
    "H", "W", "jobs", "true_c", "interpret"))
def _bl_family(u, dt, Bs, Cs, consts, H, W, jobs, true_c,
               interpret=False):
    """All jobs of one direction family in ONE pallas call.

    u, dt: FULL (K, D, L, B); Bs, Cs: (K, L, B); consts
    (K, 5, D, 1, B) f32. ``jobs``: tuple of (group_index, direction),
    all row-major (1/3) or all column-major (2/4). Operands enter the
    call via group-indexed BlockSpecs on the full arrays — no XLA-level
    group slices materialize. Returns [y_j (D, L, B)] per job in
    u.dtype.
    """
    K, D, L, B = u.shape
    vparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    is_cm = jobs[0][1] in (2, 4)
    backs = tuple(d in (3, 4) for _, d in jobs)
    if not is_cm:
        n = _chunks(L, B, D, u.dtype.itemsize)
        Lt = L // n
        in_specs, ops = [], []
        for (k, d), backward in zip(jobs, backs):
            def idx(i, k=k, r=backward):
                return (k, 0, n - 1 - i if r else i, 0)

            def sidx(i, k=k, r=backward):
                return (k, n - 1 - i if r else i, 0)
            in_specs += [
                pl.BlockSpec((None, D, Lt, B), idx,
                             memory_space=pltpu.VMEM)] * 2 + [
                pl.BlockSpec((None, Lt, B), sidx,
                             memory_space=pltpu.VMEM)] * 2 + [
                pl.BlockSpec((None, 5, D, 1, B),
                             lambda i, k=k: (k, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
            ops += [u, dt, Bs, Cs, consts]
        out_specs = [
            pl.BlockSpec((D, Lt, B),
                         (lambda i, r=r: (0, n - 1 - i if r else i, 0)),
                         memory_space=pltpu.VMEM) for r in backs]
        return pl.pallas_call(
            functools.partial(_multi_body, true_c, backs, False),
            grid=(n,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=[jax.ShapeDtypeStruct((D, L, B), u.dtype)] * len(jobs),
            scratch_shapes=[pltpu.VMEM((D, 1, B), jnp.float32)] * len(jobs),
            compiler_params=vparams,
            interpret=interpret,
        )(*ops)
    # column-major family: view (K, D, H, W, B), chunk whole columns.
    # Wt (the sublane block dim) must be a multiple of 8 or the full W
    # (Mosaic tile constraint); smallest valid width over the budget
    # wins, falling back to the full width.
    u5 = u.reshape(K, D, H, W, B)
    dt5 = dt.reshape(K, D, H, W, B)
    bs5 = Bs.reshape(K, H, W, B)
    cs5 = Cs.reshape(K, H, W, B)
    c6 = consts.reshape(K, 5, D, 1, 1, B)
    budget = _budget()
    Wt = W
    if W * H * B * D * u.dtype.itemsize > budget:
        for cand in sorted((x for x in range(8, W, 8) if W % x == 0),
                           reverse=True):
            if cand * H * B * D * u.dtype.itemsize <= budget:
                Wt = cand
                break
    n = W // Wt
    in_specs, ops = [], []
    for (k, d), backward in zip(jobs, backs):
        def idx(i, k=k, r=backward):
            return (k, 0, 0, n - 1 - i if r else i, 0)

        def sidx(i, k=k, r=backward):
            return (k, 0, n - 1 - i if r else i, 0)
        in_specs += [
            pl.BlockSpec((None, D, H, Wt, B), idx,
                         memory_space=pltpu.VMEM)] * 2 + [
            pl.BlockSpec((None, H, Wt, B), sidx,
                         memory_space=pltpu.VMEM)] * 2 + [
            pl.BlockSpec((None, 5, D, 1, 1, B),
                         lambda i, k=k: (k, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)]
        ops += [u5, dt5, bs5, cs5, c6]
    out_specs = [
        pl.BlockSpec((D, H, Wt, B),
                     (lambda i, r=r: (0, 0, n - 1 - i if r else i, 0)),
                     memory_space=pltpu.VMEM) for r in backs]
    ys = pl.pallas_call(
        functools.partial(_multi_body, true_c, backs, True),
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((D, H, W, B), u.dtype)] * len(jobs),
        scratch_shapes=[pltpu.VMEM((D, 1, 1, B), jnp.float32)] * len(jobs),
        compiler_params=vparams,
        interpret=interpret,
    )(*ops)
    return [y.reshape(D, L, B) for y in ys]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def sscan_quad_ln_cat_bl(u, dt, Bs, Cs, A, bias, Dv, ln, H, W,
                         directions):
    """Batch-last fused quad scan + group-LN, lane-concatenated output.

    u, dt: (K, D, L, B) (low precision fine); Bs, Cs: (K, L, B) f32;
    A (negative), bias, Dv: (K, D) f32; ln = (scale, offset) each
    (K, D). Returns (K*D, L, B) in u.dtype: row k*D+d is group k
    channel d of the normalized (ungated) activation —
    ``reshape(K*D, L*B)`` feeds the transposed gate GEMM with zero
    relayout. Differentiable: recompute-based custom VJP using the
    plain batch-last scan kernels (see _cat_bl_bwd below).
    """
    return _cat_bl_impl(u, dt, Bs, Cs, A, bias, Dv, ln, H, W,
                        directions)


def _cat_bl_impl(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, directions):
    K, D, L, B = u.shape
    interpret = jax.default_backend() != "tpu"
    ln_s, ln_b = ln
    bcast = lambda t: jnp.broadcast_to(
        t.astype(jnp.float32)[:, :, None], (K, D, B))
    consts = jnp.stack([bcast(A), bcast(bias), bcast(Dv), bcast(ln_s),
                        bcast(ln_b)], axis=1)[:, :, :, None, :]
    # (K, 5, D, 1, B)
    rm = tuple((k, int(d)) for k, d in enumerate(directions)
               if int(d) in (1, 3))
    cm = tuple((k, int(d)) for k, d in enumerate(directions)
               if int(d) in (2, 4))

    def call_sets(jobs, is_cm):
        """Split a family into per-job calls when the pair call's VMEM
        footprint would blow the scoped budget (cm stages whose W has no
        multiple-of-8 divisor take full-W blocks — at stage-2 scale a
        2-job call double-buffers past the 100 MB scoped limit)."""
        if len(jobs) <= 1:
            return [jobs]
        if is_cm and W * H * B * D * u.dtype.itemsize > (2 << 20):
            blk = W * H * B * D * u.dtype.itemsize
            est = len(jobs) * (3 * blk + 2 * H * W * B * 4) * 2
            if est > (45 << 20):
                return [jobs[:1], jobs[1:]]
        return [jobs]

    outs = [None] * K
    for family, is_cm in ((rm, False), (cm, True)):
        if not family:
            continue
        for jobs in call_sets(family, is_cm):
            ys = _bl_family(u, dt, Bs, Cs, consts, H, W, jobs, D,
                            interpret=interpret)
            for (k, _), y in zip(jobs, ys):
                outs[k] = y
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# Backward: plain batch-last scan kernels + the first-order-scan adjoint
# (the same recompute design as quad_scan._sscan_quad_ln_cat_bwd, with
# the channel axis moved from lanes to the outer block dim).
# ---------------------------------------------------------------------------


def _rm_plain_job(backward, step, a_ref, b_ref, out_ref, carry_ref):
    @pl.when(step == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    aP, hin = _dbl(a, b, a.shape[1], 1, backward)
    h = hin + aP * carry_ref[...]
    carry_ref[...] = _select(h, 1, 0 if backward else a.shape[1] - 1)
    out_ref[...] = h


def _plain_body(backward, a_ref, b_ref, out_ref, carry_ref):
    _rm_plain_job(backward, pl.program_id(0), a_ref, b_ref, out_ref,
                  carry_ref)


@functools.partial(jax.jit, static_argnames=("backward", "interpret"))
def _scan_flat_bl(a, b, backward, interpret=False):
    """Plain h_t = a_t h_{t-1} + b_t over axis 1 of (D, L, B) f32 —
    the flat (row-major-order) batch-last scan, grid-chunked."""
    D, L, B = a.shape
    n = _chunks(L, B, D, 4)
    Lt = L // n
    idx = (lambda i: (0, n - 1 - i, 0)) if backward else \
        (lambda i: (0, i, 0))
    spec = pl.BlockSpec((D, Lt, B), idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_plain_body, backward),
        grid=(n,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((D, L, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, 1, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(a, b)


def _to_cm_bl(x, H, W):
    """(D, H*W, B) row-major -> column-major flat order (backward-pass
    only; XLA outer-dim transpose)."""
    D, L, B = x.shape
    return jnp.swapaxes(x.reshape(D, H, W, B), 1, 2).reshape(D, L, B)


def _from_cm_bl(x, H, W):
    D, L, B = x.shape
    return jnp.swapaxes(x.reshape(D, W, H, B), 1, 2).reshape(D, L, B)


def _shift_bl(x, forward, fill):
    """x[:, t] <- x[:, t+1] (forward) or x[:, t-1] along axis 1."""
    D, L, B = x.shape
    pad = jnp.full((D, 1, B), fill, x.dtype)
    if forward:
        return jnp.concatenate([x[:, 1:], pad], axis=1)
    return jnp.concatenate([pad, x[:, :-1]], axis=1)


def _scan2d_bl(a, b, H, W, direction, interpret=False):
    """Directional 2-D scan on (D, L, B) f32 (h in row-major order)."""
    if direction in (1, 3):
        return _scan_flat_bl(a, b, direction == 3, interpret=interpret)
    a_cm = _to_cm_bl(a, H, W)
    b_cm = _to_cm_bl(b, H, W)
    h_cm = _scan_flat_bl(a_cm, b_cm, direction == 4, interpret=interpret)
    return _from_cm_bl(h_cm, H, W)


def _scan2d_bl_adj(a, h, gh, H, W, direction, interpret=False):
    """Adjoint of the directional scan: g_t = gh_t + a_{t+1} g_{t+1}
    (a scan in the reversed direction); returns (da, db)."""
    if direction in (1, 3):
        fwd = direction == 1
        a_next = _shift_bl(a, forward=fwd, fill=1.0)
        g = _scan_flat_bl(a_next, gh, not (direction == 3),
                          interpret=interpret)
        h_prev = _shift_bl(h, forward=not fwd, fill=0.0)
    else:
        fwd = direction == 2
        a_cm = _to_cm_bl(a, H, W)
        a_next = _shift_bl(a_cm, forward=fwd, fill=1.0)
        gh_cm = _to_cm_bl(gh, H, W)
        g_cm = _scan_flat_bl(a_next, gh_cm, backward=fwd,
                             interpret=interpret)
        g = _from_cm_bl(g_cm, H, W)
        h_prev = _from_cm_bl(
            _shift_bl(_to_cm_bl(h, H, W), forward=not fwd, fill=0.0),
            H, W)
    return g * h_prev, g


def _cat_bl_fwd(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, directions):
    y = _cat_bl_impl(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, directions)
    return y, (u, dt, Bs, Cs, A, bias, Dv, ln[0], ln[1])


def _cat_bl_bwd(H, W, directions, res, go):
    u0, dt0, Bs0, Cs0, A, bias, Dv, ln_s, ln_b = res
    K, D, L, B = u0.shape
    interpret = jax.default_backend() != "tpu"
    eps = 1e-5
    inv_c = 1.0 / float(D)
    cmean = lambda x: jnp.sum(x, axis=0, keepdims=True) * inv_c

    per = {k: [] for k in ("du", "ddt", "dBs", "dCs",
                           "dA", "dbias", "dD", "ds", "dt2")}
    for k, dirn in enumerate(directions):
        dirn = int(dirn)
        u = u0[k].astype(jnp.float32)
        dt = dt0[k].astype(jnp.float32)
        Bf = Bs0[k].astype(jnp.float32)[None]          # (1, L, B)
        Cf = Cs0[k].astype(jnp.float32)[None]
        g = go[k * D:(k + 1) * D].astype(jnp.float32)
        col = lambda t: t[k].astype(jnp.float32)[:, None, None]  # (D,1,1)

        pre = dt + col(bias)
        d = jax.nn.softplus(pre)
        a = jnp.exp(d * col(A))
        b = d * u * Bf
        h = _scan2d_bl(a, b, H, W, dirn, interpret=interpret)
        y = Cf * h + col(Dv) * u

        mu = cmean(y)
        var = cmean(y * y) - mu * mu
        ir = jax.lax.rsqrt(var + eps)
        yn = (y - mu) * ir

        per["ds"].append(jnp.sum(g * yn, axis=(1, 2)))
        per["dt2"].append(jnp.sum(g, axis=(1, 2)))
        dyn = g * col(ln_s)
        dy = ir * (dyn - cmean(dyn) - yn * cmean(dyn * yn))

        per["dCs"].append(jnp.sum(h * dy, axis=0))
        per["dD"].append(jnp.sum(u * dy, axis=(1, 2)))
        gh = Cf * dy
        da, db = _scan2d_bl_adj(a, h, gh, H, W, dirn,
                                interpret=interpret)

        dd = db * u * Bf + (da * a) * col(A)
        ddt = dd * jax.nn.sigmoid(pre)
        per["du"].append(db * d * Bf + col(Dv) * dy)
        per["dBs"].append(jnp.sum(db * d * u, axis=0))
        per["dA"].append(jnp.sum(da * a * d, axis=(1, 2)))
        per["dbias"].append(jnp.sum(ddt, axis=(1, 2)))
        per["ddt"].append(ddt)

    stk = lambda xs: jnp.stack(xs, axis=0)
    cast = lambda x, r: x.astype(r.dtype)
    return (cast(stk(per["du"]), u0), cast(stk(per["ddt"]), dt0),
            cast(stk(per["dBs"]), Bs0), cast(stk(per["dCs"]), Cs0),
            stk(per["dA"]), stk(per["dbias"]), stk(per["dD"]),
            (stk(per["ds"]), stk(per["dt2"])))


sscan_quad_ln_cat_bl.defvjp(_cat_bl_fwd, _cat_bl_bwd)


# ---------------------------------------------------------------------------
# Batch-last depthwise 3x3 conv (+bias) — the one spatial op inside the
# quad sandwich. On (C, H, W, B) blocks every tap is an outer-dim (H) or
# sublane (W) shift; per-channel scalar weights broadcast from
# (9, Ct, 1, 1, B) constants. Enables the FULLY-transposed quad sandwich
# (CEIGM_BLAST=2): in-proj GEMM -> dwconv -> silu -> scan -> gate ->
# out-proj all in (C, L*B) space — operands already in the tokens-minor
# physical layout XLA's GEMM emitters pick, so the per-tensor 49 MiB
# boundary reshapes/copies of the NHWC formulation vanish.
# ---------------------------------------------------------------------------


def _dw_body(taps, Hh, Ww, x_ref, w_ref, b_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    acc = b_ref[0]                               # (Ct, 1, 1, B) bias
    for t, (dy, dx) in enumerate(taps):
        v = x
        if dy:
            fill = jnp.zeros((x.shape[0], abs(dy), Ww, x.shape[3]),
                             jnp.float32)
            v = (jnp.concatenate([v[:, dy:], fill], axis=1) if dy > 0
                 else jnp.concatenate([fill, v[:, :dy]], axis=1))
        if dx:
            fill = jnp.zeros((x.shape[0], Hh, abs(dx), x.shape[3]),
                             jnp.float32)
            v = (jnp.concatenate([v[:, :, dx:], fill], axis=2) if dx > 0
                 else jnp.concatenate([fill, v[:, :, :dx]], axis=2))
        acc = acc + w_ref[t] * v
    out_ref[...] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "flip",
                                             "interpret"))
def _dwconv_bl_kernel(x, wb, bb, H, W, flip=False, interpret=False):
    """x: (C, H, W, B); wb: (9, C, 1, 1, B) f32 taps (row-major dy,dx in
    {-1,0,1}); bb: (1, C, 1, 1, B) f32. 'SAME' zero padding."""
    C, _, _, B = x.shape
    taps = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    if flip:
        taps = tuple((-dy, -dx) for dy, dx in taps)
    # channel-chunk the grid to bound VMEM
    Ct = C
    while Ct > 1 and Ct * H * W * B * 4 > (8 << 20):
        for d in range(Ct - 1, 0, -1):
            if C % d == 0 and d < Ct:
                Ct = d
                break
        else:
            break
    n = C // Ct
    spec = pl.BlockSpec((Ct, H, W, B), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_dw_body, taps, H, W),
        grid=(n,),
        in_specs=[spec,
                  pl.BlockSpec((9, Ct, 1, 1, B), lambda i: (0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, Ct, 1, 1, B), lambda i: (0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, wb, bb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def dwconv_bl(x, kernel, bias, H, W):
    """Depthwise 3x3 'SAME' conv on batch-last (C, H, W, B).

    kernel: (3, 3, 1, C) (nn.Conv depthwise layout); bias: (C,) or None
    is NOT supported here — pass zeros. Returns (C, H, W, B) in
    x.dtype.
    """
    return _dwconv_bl_fwd(x, kernel, bias, H, W)[0]


def _dw_consts(kernel, bias, C, B):
    wb = jnp.broadcast_to(
        kernel.astype(jnp.float32).reshape(9, C)[:, :, None, None, None],
        (9, C, 1, 1, B))
    bb = jnp.broadcast_to(
        bias.astype(jnp.float32)[None, :, None, None, None],
        (1, C, 1, 1, B))
    return wb, bb


def _dwconv_bl_fwd(x, kernel, bias, H, W):
    C, _, _, B = x.shape
    interpret = jax.default_backend() != "tpu"
    wb, bb = _dw_consts(kernel, bias, C, B)
    y = _dwconv_bl_kernel(x, wb, bb, H, W, interpret=interpret)
    return y, (x, kernel)


def _dwconv_bl_bwd(H, W, res, g):
    x, kernel = res
    C, _, _, B = x.shape
    interpret = jax.default_backend() != "tpu"
    # dx: correlate g with the flipped taps (zero bias)
    wb, bb = _dw_consts(kernel, jnp.zeros((C,), jnp.float32), C, B)
    dx = _dwconv_bl_kernel(g, wb, bb, H, W, flip=True,
                           interpret=interpret)
    # dkernel / dbias: tap-shifted reductions (backward-only, XLA)
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dks = []
    for dy in (-1, 0, 1):
        for dx_ in (-1, 0, 1):
            v = xp[:, 1 + dy:1 + dy + H, 1 + dx_:1 + dx_ + W]
            dks.append(jnp.sum(v * gf, axis=(1, 2, 3)))
    dkernel = jnp.stack(dks).reshape(3, 3, 1, C).astype(kernel.dtype)
    dbias = jnp.sum(gf, axis=(1, 2, 3))
    return dx.astype(x.dtype), dkernel, dbias


dwconv_bl.defvjp(_dwconv_bl_fwd, _dwconv_bl_bwd)
