"""Probe XLA's emitter choice for the stage-1 skinny-N GEMMs.

The block HLO shows N=64 dense layers (out_proj 256->64, proj 64->64,
ffn-down 512->64) lowering through EmitOutputBatchInLanes* conv emitters
at ~500k cycles — 15-60x over MXU ideal — and emitting batch-minor
layouts that force relayout copies + slow LN stat reductions everywhere
downstream. This experiment A/Bs candidate shapes/paddings.

Run on the real TPU: python tools/exp_gemm64.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_attr import trace_ops

M = 64 * 56 * 56
DT = jnp.bfloat16


def ln(y):
    y32 = y.astype(jnp.float32)
    mu = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.var(y32, axis=-1, keepdims=True)
    return ((y32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype)


def run(name, fn, *args):
    rows = trace_ops(fn, *args, iters=6)
    tot = sum(d for d, _, _ in rows)
    top = ", ".join(f"{d:.3f} {n[:28]}" for d, n, _ in rows[:3])
    print(f"{tot:8.3f} ms  {name:34s} [{top}]")


def main():
    k = jax.random.PRNGKey(0)
    x256 = jax.random.normal(k, (M, 256), DT)
    x64 = jax.random.normal(k, (M, 64), DT)
    x512 = jax.random.normal(k, (M, 512), DT)
    w256_64 = jax.random.normal(k, (256, 64), DT)
    w256_128 = jax.random.normal(k, (256, 128), DT)
    w64_64 = jax.random.normal(k, (64, 64), DT)
    w512_64 = jax.random.normal(k, (512, 64), DT)

    # baselines: bare GEMMs
    run("gemm 256->64", lambda a, w: a @ w, x256, w256_64)
    run("gemm 256->128", lambda a, w: a @ w, x256, w256_128)
    run("gemm 64->64", lambda a, w: a @ w, x64, w64_64)
    run("gemm 512->64", lambda a, w: a @ w, x512, w512_64)
    # padded-N then slice
    run("gemm 256->128, slice 64",
        lambda a, w: (a @ w)[:, :64], x256, w256_128)
    # GEMM + LN fused epilogue (the convert_reduce pattern)
    run("gemm 256->64 + LN", lambda a, w: ln(a @ w), x256, w256_64)
    run("gemm 256->128, slice + LN",
        lambda a, w: ln((a @ w)[:, :64]), x256, w256_128)
    # NHWC view (what the model actually does)
    x4 = x256.reshape(64, 56, 56, 256)
    run("nhwc gemm 256->64 + LN",
        lambda a, w: ln(jnp.einsum("bhwc,cd->bhwd", a, w)), x4, w256_64)
    # fp32 accumulate-output variant
    run("gemm 256->64 pref f32",
        lambda a, w: jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), x256, w256_64)
    # two skinny GEMMs chained (proj after out_proj, as in the block)
    run("chain 256->64->64 + LN",
        lambda a, w1, w2: ln(ln(a @ w1) @ w2), x256, w256_64, w64_64)


if __name__ == "__main__":
    main()


def main2():
    """Extended probe: skinny-N with large K + padded-N fixes."""
    k = jax.random.PRNGKey(0)
    x512 = jax.random.normal(k, (M, 512), DT)
    M2 = 64 * 28 * 28
    x1024 = jax.random.normal(k, (M2, 1024), DT)
    for (xx, K, N) in ((x512, 512, 64), (x512, 512, 128),
                       (x512, 512, 256), (x1024, 1024, 128),
                       (x1024, 1024, 256)):
        w = jax.random.normal(k, (K, N), DT)
        run(f"gemm {K}->{N} (M={xx.shape[0]})", lambda a, w: a @ w, xx, w)
    # padded-N + slice variants of the 512->64 FFN down-proj
    w128 = jax.random.normal(k, (512, 128), DT)
    run("gemm 512->128, slice 64", lambda a, w: (a @ w)[:, :64], x512, w128)
    run("gemm 512->128, slice + LN",
        lambda a, w: ln((a @ w)[:, :64]), x512, w128)
    # split-K: two 256->64 GEMMs summed
    w64a = jax.random.normal(k, (256, 64), DT)
    w64b = jax.random.normal(k, (256, 64), DT)
    run("splitK 2x(256->64) sum",
        lambda a, w1, w2: a[:, :256] @ w1 + a[:, 256:] @ w2,
        x512, w64a, w64b)
    # f32 preferred output
    w64 = jax.random.normal(k, (512, 64), DT)
    run("gemm 512->64 pref f32",
        lambda a, w: jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), x512, w64)


if __name__ == "__main__" and os.environ.get("EXP2"):
    main2()
