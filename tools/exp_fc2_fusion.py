"""Replicate + fix the batch-in-lanes mega-fusion around the FFN fc2.

The model HLO shows XLA fusing [dwconv3x3 -> gelu -> fc2 dot (rewritten
to a 1x1 conv, EmitOutputBatchInLanesInputBatchInSublanes) -> residual
add -> LN-stat reduces] into ONE fusion per block at ~1.1 ms (17x off
bandwidth) — the whole "convert_reduce" 14 ms bucket. Standalone, the
same 512->64 GEMM is bandwidth-bound at 0.316 ms (exp_gemm64).

Variants A/B where to place jax.lax.optimization_barrier to break it.

Run: python tools/exp_fc2_fusion.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_attr import trace_ops
from ceigm_unet_tpu.ops.activations import gelu as fast_gelu
from ceigm_unet_tpu.ops.dwconv_pallas import depthwise_conv2d

B, H, W, C, HID = 64, 56, 56, 64, 512
DT = jnp.bfloat16


def chain(x, resid, dwk, w2, barrier_fc2=False, barrier_ln=False):
    h = depthwise_conv2d(x, dwk, None)
    h = fast_gelu(h)
    if barrier_fc2:
        h = jax.lax.optimization_barrier(h)
    y = jnp.einsum("bhwc,cd->bhwd", h, w2)
    y = resid + y
    if barrier_ln:
        y = jax.lax.optimization_barrier(y)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.var(yf, axis=-1, keepdims=True)
    out = ((yf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(DT)
    return out


def run(name, **kw):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, H, W, HID), DT)
    resid = jax.random.normal(k, (B, H, W, C), DT)
    dwk = jax.random.normal(k, (3, 3, 1, HID), DT) * 0.1
    w2 = jax.random.normal(k, (HID, C), DT) * 0.05
    rows = trace_ops(lambda a, r: chain(a, r, dwk, w2, **kw), x, resid)
    tot = sum(d for d, _, _ in rows)
    top = ", ".join(f"{d:.3f} {n[:30]}" for d, n, _ in rows[:4])
    print(f"{tot:8.3f} ms  {name:28s} [{top}]")


def main():
    run("plain (model repro)")
    run("barrier before fc2", barrier_fc2=True)
    run("barrier before LN", barrier_ln=True)
    run("both barriers", barrier_fc2=True, barrier_ln=True)


if __name__ == "__main__":
    main()
