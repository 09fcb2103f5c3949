"""De-risk experiment: two-level (W-then-H / H-then-W) selective scans in
the NHWC-native (L, C) sublane layout inside one Pallas kernel — the core
of the fused quad-block kernel. Verifies correctness vs the reference scan
on CPU (interpret) and, on TPU, times the kernel at stage-1 shape.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _doubling(a, b, axis, size, backward):
    """Inclusive doubling scan along `axis` of 2-D (S0, S1) arrays."""
    k = 1
    while k < size:
        if axis == 0:
            ones = jnp.ones((k, a.shape[1]), jnp.float32)
            zeros = jnp.zeros((k, b.shape[1]), jnp.float32)
            if backward:
                a_sh = jnp.concatenate([a[k:], ones], axis=0)
                b_sh = jnp.concatenate([b[k:], zeros], axis=0)
            else:
                a_sh = jnp.concatenate([ones, a[:-k]], axis=0)
                b_sh = jnp.concatenate([zeros, b[:-k]], axis=0)
        else:
            ones = jnp.ones((a.shape[0], k), jnp.float32)
            zeros = jnp.zeros((b.shape[0], k), jnp.float32)
            if backward:
                a_sh = jnp.concatenate([a[:, k:], ones], axis=1)
                b_sh = jnp.concatenate([b[:, k:], zeros], axis=1)
            else:
                a_sh = jnp.concatenate([ones, a[:, :-k]], axis=1)
                b_sh = jnp.concatenate([zeros, b[:, :-k]], axis=1)
        b = b + a * b_sh
        a = a * a_sh
        k *= 2
    return a, b


def rowmajor_scan(aw, bw, H, W, C, backward=False):
    """Inclusive scan in row-major pixel order on (H, W*C)-view arrays,
    computed two-level: W-scan within rows (lane shifts in the (H, W*C)
    view), then an H-scan of row summaries, then a fold. No transposes."""

    # level 1: scan along W inside each row. Work in the (H, W*C) view;
    # a lane shift by k*C moves pixel w -> w+k for every channel.
    k = 1
    a1, b1 = aw, bw
    while k < W:
        if backward:
            a_sh = jnp.concatenate(
                [a1[:, k * C:], jnp.ones((H, k * C), jnp.float32)], axis=1)
            b_sh = jnp.concatenate(
                [b1[:, k * C:], jnp.zeros((H, k * C), jnp.float32)], axis=1)
        else:
            a_sh = jnp.concatenate(
                [jnp.ones((H, k * C), jnp.float32), a1[:, :-k * C]], axis=1)
            b_sh = jnp.concatenate(
                [jnp.zeros((H, k * C), jnp.float32), b1[:, :-k * C]], axis=1)
        b1 = b1 + a1 * b_sh
        a1 = a1 * a_sh
        k *= 2

    # level 2: row summaries live at w = W-1 (fwd) or w = 0 (bwd).
    # Mosaic can't consume slices at non-zero lane offsets downstream, so
    # roll the summary lanes to offset 0 before slicing (fwd case).
    if backward:
        a_sum = a1[:, :C]
        b_sum = b1[:, :C]
    else:
        a_sum = pltpu.roll(a1, C, 1)[:, :C]
        b_sum = pltpu.roll(b1, C, 1)[:, :C]
    a2, b2 = _doubling(a_sum, b_sum, axis=0, size=H, backward=backward)

    # exclusive prefix per row: shift the inclusive row-summary scan by 1
    if backward:
        pre = jnp.concatenate(
            [b2[1:], jnp.zeros((1, C), jnp.float32)], axis=0)
    else:
        pre = jnp.concatenate(
            [jnp.zeros((1, C), jnp.float32), b2[:-1]], axis=0)

    # fold: h = b1 + a1 * prefix(row), prefix broadcast over W
    pre_w = jnp.tile(pre, (1, W))
    return b1 + a1 * pre_w


def colmajor_scan(aw, bw, H, W, C, backward=False):
    """Inclusive scan in column-major pixel order on (H, W*C)-view arrays:
    H-scan within columns (sublane shifts), then a W-scan of column
    summaries, then a fold."""
    a1, b1 = _doubling(aw, bw, axis=0, size=H, backward=backward)

    # column summaries: last row (fwd) / first row (bwd) -> (W*C,) lanes
    if backward:
        a_sum, b_sum = a1[0:1], b1[0:1]                  # (1, W*C)
    else:
        a_sum = pltpu.roll(a1, 1, 0)[0:1]
        b_sum = pltpu.roll(b1, 1, 0)[0:1]

    # scan over W: lane-shift doubling with stride C on the (1, W*C) row
    k = 1
    a2, b2 = a_sum, b_sum
    while k < W:
        if backward:
            a_sh = jnp.concatenate(
                [a2[:, k * C:], jnp.ones((1, k * C), jnp.float32)], axis=1)
            b_sh = jnp.concatenate(
                [b2[:, k * C:], jnp.zeros((1, k * C), jnp.float32)], axis=1)
        else:
            a_sh = jnp.concatenate(
                [jnp.ones((1, k * C), jnp.float32), a2[:, :-k * C]], axis=1)
            b_sh = jnp.concatenate(
                [jnp.zeros((1, k * C), jnp.float32), b2[:, :-k * C]], axis=1)
        b2 = b2 + a2 * b_sh
        a2 = a2 * a_sh
        k *= 2

    # exclusive prefix per column, broadcast over H
    if backward:
        pre = jnp.concatenate(
            [b2[:, C:], jnp.zeros((1, C), jnp.float32)], axis=1)
    else:
        pre = jnp.concatenate(
            [jnp.zeros((1, C), jnp.float32), b2[:, :-C]], axis=1)
    return b1 + a1 * jnp.broadcast_to(pre, (H, W * C))


def _kernel(H, W, C, mode, a_ref, b_ref, out_ref):
    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    if mode == "rm_f":
        h = rowmajor_scan(a, b, H, W, C, backward=False)
    elif mode == "rm_b":
        h = rowmajor_scan(a, b, H, W, C, backward=True)
    elif mode == "cm_f":
        h = colmajor_scan(a, b, H, W, C, backward=False)
    else:
        h = colmajor_scan(a, b, H, W, C, backward=True)
    out_ref[...] = h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "mode",
                                             "interpret"))
def scan2l(a, b, H, W, C, mode, interpret=False):
    B = a.shape[0]
    a = a.reshape(B, H, W * C)
    b = b.reshape(B, H, W * C)
    out = pl.pallas_call(
        functools.partial(_kernel, H, W, C, mode),
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
    return out.reshape(B, H * W, C)


def ref_scan(a, b, order, backward):
    """NumPy reference: sequential scan over pixels in the given order."""
    B, L, C = a.shape
    h = np.zeros((B, L, C), np.float64)
    idx = order[::-1] if backward else order
    state = np.zeros((B, C), np.float64)
    for t in idx:
        state = a[:, t] * state + b[:, t]
        h[:, t] = state
    return h


def check():
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 8, 8, 16  # tiny; interpret mode
    L = H * W
    a = np.exp(-rng.random((B, L, C))).astype(np.float32)
    b = rng.standard_normal((B, L, C)).astype(np.float32)
    rm = np.arange(L)
    cm = np.arange(L).reshape(H, W).T.ravel()  # col-major pixel order
    interp = jax.default_backend() != "tpu"
    for mode, order, backward in (("rm_f", rm, False), ("rm_b", rm, True),
                                  ("cm_f", cm, False), ("cm_b", cm, True)):
        got = np.asarray(scan2l(jnp.asarray(a), jnp.asarray(b),
                                H, W, C, mode, interpret=interp))
        want = ref_scan(a, b, order, backward)
        err = np.abs(got - want).max()
        print(f"{mode}: max err {err:.2e}", "OK" if err < 1e-4 else "FAIL",
              flush=True)


def bench():
    import functools as ft
    print = ft.partial(__builtins__.print, flush=True) \
        if not isinstance(__builtins__, dict) else None
    from tools.bench_variants import loop_time
    B, H, W, C = 64, 56, 56, 64
    a = jnp.ones((B, H * W, C), jnp.float32) * 0.9
    b = jnp.ones((B, H * W, C), jnp.float32)
    for mode in ("rm_f", "rm_b", "cm_f", "cm_b"):
        t = loop_time(lambda x: scan2l(x, b, H, W, C, mode), a, n=8)
        __builtins__.print(f"{mode}: {t*1e3:7.3f} ms", flush=True) \
            if not isinstance(__builtins__, dict) else \
            print(f"{mode}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    check()
    if jax.default_backend() == "tpu" and "--bench" in sys.argv:
        bench()
