"""Probe the channels-first (Dg, L) scan-kernel design on real TPU.

Motivation (r3 session-6): the quad path's ~10 x 24.5 MiB relayouts per
stage-1 block exist because XLA's GEMM emitters put tokens on lanes
({0,1} on (B*L, C) outputs) while pallas forces default layouts. A GEMM
emitted TRANSPOSED — (C_out, tokens) — has tokens-minor as its default
layout, so a kernel family operating on (Dg, L) tiles (channels on
sublanes, tokens on lanes) could consume GEMM outputs copy-free.

Unknowns probed here:
  P1: cost of the doubling scan on (Dg, L) lane tiles (shifts by 1..L/2
      along LANES, sub-128 granularity) vs the committed (H, W*Dg) view
      (lane shifts by k*Dg + sublane shifts). Row-major and col-major
      (two-level with tiny selector matmuls for column summaries).
  P2: whether the transposed-GEMM -> pallas -> transposed-GEMM chain
      actually compiles without relayout copies, vs the current
      tokens-major chain (HLO copy count + same-process A/B).

Usage: python tools/exp_cfirst.py [p1|p2|all]
"""
from __future__ import annotations

import functools
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.bench_variants import loop_time

print = functools.partial(print, flush=True)

B, H, W, Dg = 64, 56, 56, 16
L = H * W


# --------------------------------------------------------------- P1 ----

def scan_hwview(a, b):
    """Committed-style two-level row-major scan on the (H, W*Dg) view."""
    def kernel(a_ref, b_ref, o_ref):
        av = a_ref[0]
        bv = b_ref[0]
        k = 1
        while k < W:
            sh = k * Dg
            ones = jnp.ones((H, sh), jnp.float32)
            zeros = jnp.zeros((H, sh), jnp.float32)
            a_sh = jnp.concatenate([ones, av[:, :-sh]], 1)
            b_sh = jnp.concatenate([zeros, bv[:, :-sh]], 1)
            bv = bv + av * b_sh
            av = av * a_sh
            k *= 2
        # H-level on row summaries
        a_sum = pltpu.roll(av, Dg, 1)[:, :Dg]
        b_sum = pltpu.roll(bv, Dg, 1)[:, :Dg]
        k = 1
        while k < H:
            ones = jnp.ones((k, Dg), jnp.float32)
            zeros = jnp.zeros((k, Dg), jnp.float32)
            a2 = jnp.concatenate([ones, a_sum[:-k]], 0)
            b2 = jnp.concatenate([zeros, b_sum[:-k]], 0)
            b_sum = b_sum + a_sum * b2
            a_sum = a_sum * a2
            k *= 2
        pre = jnp.concatenate([jnp.zeros((1, Dg), jnp.float32), b_sum[:-1]], 0)
        o_ref[0] = bv + av * jnp.tile(pre, (1, W))

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W * Dg), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, H, W * Dg), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W * Dg), jnp.float32),
    )(a, b)


def scan_cfirst_row(a, b):
    """Row-major scan on the (Dg, L) channels-first view: doubling with
    lane shifts 1..L/2."""
    def kernel(a_ref, b_ref, o_ref):
        av = a_ref[0]
        bv = b_ref[0]
        k = 1
        while k < L:
            ones = jnp.ones((Dg, k), jnp.float32)
            zeros = jnp.zeros((Dg, k), jnp.float32)
            a_sh = jnp.concatenate([ones, av[:, :-k]], 1)
            b_sh = jnp.concatenate([zeros, bv[:, :-k]], 1)
            bv = bv + av * b_sh
            av = av * a_sh
            k *= 2
        o_ref[0] = bv

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Dg, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((1, Dg, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Dg, L), jnp.float32),
    )(a, b)


def scan_cfirst_row2(a, b):
    """Row-major scan on (Dg, L), TWO-LEVEL: lane doubling within rows
    (shifts 1..W/2 with row-edge masks), then row summaries via selector
    matmul, sublane-free row scan, scatter back via selector matmul."""
    io_l = np.arange(L, dtype=np.int64)
    sel_pick = (io_l[:, None] == (np.arange(H) * W + W - 1)[None, :]
                ).astype(np.float32)                     # (L, H) pick row ends
    # lane l belongs to row l // W; prefix of row r broadcast to row lanes
    sel_bcast = ((io_l[:, None] // W) == np.arange(H)[None, :]
                 ).astype(np.float32).T                  # (H, L)
    sel_pick_j = jnp.asarray(sel_pick)
    sel_bcast_j = jnp.asarray(sel_bcast)

    def kernel(a_ref, b_ref, sp_ref, sb_ref, o_ref):
        sel_pick_k = sp_ref[...]
        sel_bcast_k = sb_ref[...]
        av = a_ref[0]
        bv = b_ref[0]
        # level 1: within-row scan; shifted values from other rows are
        # masked via the multiplicative identity (a=1, b=0) at row starts
        col = jax.lax.broadcasted_iota(jnp.int32, (Dg, L), 1) % W
        k = 1
        while k < W:
            ok = (col >= k)
            a_sh = jnp.where(ok, jnp.concatenate(
                [jnp.ones((Dg, k), jnp.float32), av[:, :-k]], 1), 1.0)
            b_sh = jnp.where(ok, jnp.concatenate(
                [jnp.zeros((Dg, k), jnp.float32), bv[:, :-k]], 1), 0.0)
            bv = bv + av * b_sh
            av = av * a_sh
            k *= 2
        # level 2: row summaries (Dg, H) via selector matmul
        dot = lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a_sum = dot(av, sel_pick_k)                      # (Dg, H)
        b_sum = dot(bv, sel_pick_k)
        k = 1
        while k < H:
            ones = jnp.ones((Dg, k), jnp.float32)
            zeros = jnp.zeros((Dg, k), jnp.float32)
            a2 = jnp.concatenate([ones, a_sum[:, :-k]], 1)
            b2 = jnp.concatenate([zeros, b_sum[:, :-k]], 1)
            b_sum = b_sum + a_sum * b2
            a_sum = a_sum * a2
            k *= 2
        pre = jnp.concatenate(
            [jnp.zeros((Dg, 1), jnp.float32), b_sum[:, :-1]], 1)
        o_ref[0] = bv + av * dot(pre, sel_bcast_k)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, Dg, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2 + [
            pl.BlockSpec((L, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Dg, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Dg, L), jnp.float32),
    )(a, b, sel_pick_j, sel_bcast_j)


def ref_scan_rowmajor(a, b):
    def comb(c1, c2):
        return c1[0] * c2[0], c2[0] * c1[1] + c2[1]
    aa, bb = jax.lax.associative_scan(comb, (a, b), axis=-1)
    return bb


def p1():
    rng = np.random.default_rng(0)
    a = jnp.asarray(0.9 + 0.1 * rng.random((B, Dg, L)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, Dg, L)), jnp.float32)
    want = np.asarray(ref_scan_rowmajor(a, b))

    a_hw = a.swapaxes(1, 2).reshape(B, H, W * Dg)
    b_hw = b.swapaxes(1, 2).reshape(B, H, W * Dg)

    got = np.asarray(scan_hwview(a_hw, b_hw)).reshape(B, L, Dg).transpose(
        0, 2, 1)
    print("hwview   max|err|", np.abs(got - want).max())
    t = loop_time(lambda x: scan_hwview(a_hw, x) * 1e-6 + x, b_hw, n=64)
    print(f"hwview   {t*1e3:7.3f} ms")

    for name, fn in (("cf_flat", scan_cfirst_row),
                     ("cf_2lvl", scan_cfirst_row2)):
        got = np.asarray(fn(a, b))
        print(f"{name}  max|err|", np.abs(got - want).max())
        t = loop_time(lambda x: fn(a, x) * 1e-6 + x, b, n=64)
        print(f"{name}  {t*1e3:7.3f} ms")


# --------------------------------------------------------------- P2 ----

def p2():
    C = 64
    Din = 64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, L, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((C, Din)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((Din, C)) * 0.1, jnp.bfloat16)

    def passthrough_tok(xc):                      # (B, K, L, D) style
        def kernel(i_ref, o_ref):
            o_ref[...] = i_ref[...] * 2.0
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, L, Din), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, L, Din), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, Din), jnp.bfloat16),
        )(xc)

    def passthrough_cf(xc):                       # (B, Din, L) style
        def kernel(i_ref, o_ref):
            o_ref[...] = i_ref[...] * 2.0
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, Din, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Din, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Din, L), jnp.bfloat16),
        )(xc)

    def chain_tok(x):
        xc = (x.reshape(B * L, C) @ w1).reshape(B, L, Din)
        y = passthrough_tok(xc)
        return (y.reshape(B * L, Din) @ w2).reshape(B, L, C)

    def chain_cf(x):
        # broadcast-batched transposed GEMM: out (B, Din, L) — channels
        # on sublanes, tokens on lanes (the emitters' preferred physical
        # order as its DEFAULT layout)
        xt = jax.lax.dot_general(
            jnp.broadcast_to(w1, (B, C, Din)), x,
            (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y = passthrough_cf(xt)                    # (B, Din, L)
        out = jax.lax.dot_general(
            jnp.broadcast_to(w2, (B, Din, C)), y,
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # back to (B, L, C) world at the exit
        return out.transpose(0, 2, 1)             # (B, L, C)

    for name, fn in (("tok", chain_tok), ("cf ", chain_cf)):
        comp = jax.jit(fn).lower(x).compile()
        txt = comp.as_text()
        copies = []
        in_entry = False
        for ln in txt.splitlines():
            s = ln.strip()
            if s.startswith("ENTRY "):
                in_entry = True
                continue
            if in_entry and s == "}":
                in_entry = False
            if in_entry and re.match(
                    r"%?(copy|transpose|reshape)[\w.\-]* =", s):
                copies.append(s[:110])
        got = np.asarray(fn(x), np.float32)
        t = loop_time(lambda q: fn(q) * jnp.bfloat16(1e-3) + q, x, n=8)
        print(f"{name}: {t*1e3:7.3f} ms   {len(copies)} copy-class instrs")
        for c in copies:
            print("     ", c)
        if name == "tok":
            want = got
        else:
            print("   max|diff| vs tok:", np.abs(got - want).max())


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("p1", "all"):
        p1()
    if what in ("p2", "all"):
        p2()
