"""One-off variant shootout for hot elementwise/matmul ops (real TPU).

Compares implementation candidates at in-model shapes so optimization
choices are measured, not guessed. Usage: python tools/bench_variants.py
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

print = functools.partial(print, flush=True)
BATCH = 64


def loop_time(body, x0, n=8):
    @jax.jit
    def run(x, n):
        o = jax.lax.fori_loop(0, n, lambda i, x: body(x), x)
        return jnp.sum(o.astype(jnp.float32).ravel()[:8])

    def once(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(run(x0, n)))
            best = min(best, time.perf_counter() - t0)
        return best

    np.asarray(jax.device_get(run(x0, 2)))
    return max(once(2 * n) - once(n), 1e-9) / n


def chain(fn):
    def body(x):
        y = fn(x)
        return x * jnp.asarray(0.999, x.dtype) + jnp.mean(
            y.astype(jnp.float32)).astype(x.dtype) * 1e-6
    return body


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def gelu_sigmoid(x):
    return x * jax.nn.sigmoid(jnp.asarray(1.702, x.dtype) * x)


def gelu_exact_f32(x):
    return jax.nn.gelu(x.astype(jnp.float32),
                       approximate=False).astype(x.dtype)


def erf_poly(t):
    # Abramowitz-Stegun 7.1.26-style poly on |t|; exactness to ~1e-7
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    s = jnp.sign(t)
    t = jnp.abs(t)
    u = 1.0 / (1.0 + 0.3275911 * t)
    p = u * (a[0] + u * (a[1] + u * (a[2] + u * (a[3] + u * a[4]))))
    return s * (1.0 - p * jnp.exp(-t * t))


def gelu_erfpoly(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + erf_poly(xf * 0.7071067811865476))
            ).astype(x.dtype)


def main():
    shape = (BATCH, 56, 56, 512)
    for name, fn in [("gelu_exact_bf16", gelu_exact),
                     ("gelu_exact_f32io", gelu_exact_f32),
                     ("gelu_tanh_bf16", gelu_tanh),
                     ("gelu_sigmoid_bf16", gelu_sigmoid),
                     ("gelu_erfpoly_bf16", gelu_erfpoly)]:
        x = jnp.ones(shape, jnp.bfloat16)
        t = loop_time(chain(fn), x)
        print(f"{name:22s} {t*1e3:8.3f} ms")
        if name != "gelu_exact_bf16":
            ref = gelu_exact(jnp.linspace(-6, 6, 4096, dtype=jnp.float32))
            got = fn(jnp.linspace(-6, 6, 4096, dtype=jnp.float32))
            print(f"{'':22s} max|err| vs exact fp32: "
                  f"{float(jnp.max(jnp.abs(got - ref))):.2e}")

    # fc2-style narrow-out matmuls
    for (cin, cout) in ((512, 64), (512, 128), (64, 512)):
        w = jnp.ones((cin, cout), jnp.bfloat16)
        x = jnp.ones((BATCH, 56, 56, cin), jnp.bfloat16)

        def mm(v):
            return jax.lax.dot_general(
                v.reshape(-1, cin), w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        t = loop_time(chain(mm), x)
        gf = BATCH * 56 * 56 * cin * cout * 2 / 1e9
        print(f"mm {cin}->{cout:4d}          {t*1e3:8.3f} ms   "
              f"{gf / t / 1e3:7.1f} TFLOP/s")

    # silu variants at quad shapes
    x = jnp.ones((BATCH, 56, 56, 64), jnp.bfloat16)
    t = loop_time(chain(jax.nn.silu), x)
    print(f"{'silu_bf16_64ch':22s} {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
