"""TPU spot-run of the production-shape kernel matrix.

tests/test_kernel_matrix.py and tests/test_quad_bl.py run in Pallas
interpret mode on CPU (the conftest forces it); this script executes
representative cases of the same differentials on the REAL TPU — Mosaic
lowering included — and prints max errors vs the fp32 associative-scan
reference. Record the output in docs/STATUS.md.

Run: python tools/spot_kernel_tpu.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.quad_scan import sscan_dir, sscan_quad_ln_cat
from ceigm_unet_tpu.ops.quad_scan_bl import sscan_quad_ln_cat_bl

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_kernel_matrix import (  # noqa: E402
    _inputs, _ref_sscan, TOL)


def spot_sscan_dir(H, W, C, dtype, direction=2):
    u, dt, Bb, Cb, A, bias, Dv = _inputs(H, W, C, dtype, seed=direction)
    Bb = jnp.broadcast_to(Bb, u.shape)
    Cb = jnp.broadcast_to(Cb, u.shape)
    got = np.asarray(jax.jit(
        lambda *a: sscan_dir(*a, H, W, direction))(
        u, dt, Bb, Cb, A, bias, Dv), np.float32)
    want = np.asarray(jax.jit(
        lambda *a: _ref_sscan(*a, H, W, direction))(
        u, dt, Bb, Cb, A, bias, Dv), np.float32)
    err = np.abs(got - want).max()
    tol = TOL[dtype]["atol"] * max(1.0, np.abs(want).max())
    name = jnp.dtype(dtype).name
    print(f"sscan_dir L={H * W} {name}: max err {err:.2e} "
          f"(tol {tol:.2e}) {'OK' if err < tol else 'FAIL'}")


def spot_blast(H, W, D, B, dtype):
    """Batch-last kernels (real Mosaic lowering) vs the established
    (B, K, L, D) kernels at a production shape."""
    K, dirs = 4, (1, 2, 3, 4)
    rng = np.random.default_rng(D)
    L = H * W
    u = jnp.asarray(rng.standard_normal((B, K, L, D)), dtype)
    dt = jnp.asarray(0.5 * rng.standard_normal((B, K, L, D)), dtype)
    Bs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    Cs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((K, D)) * 0.5),
                    jnp.float32)
    bias = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_s = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    want = np.asarray(jax.jit(lambda *a: sscan_quad_ln_cat(
        *a, (ln_s, ln_b), H, W, dirs))(u, dt, Bs, Cs, A, bias, Dv),
        np.float32)                                   # (B, L, K*D)
    got = np.asarray(jax.jit(lambda *a: sscan_quad_ln_cat_bl(
        *a, (ln_s, ln_b), H, W, dirs))(
        jnp.transpose(u, (1, 3, 2, 0)), jnp.transpose(dt, (1, 3, 2, 0)),
        jnp.transpose(Bs, (1, 2, 0)), jnp.transpose(Cs, (1, 2, 0)),
        A, bias, Dv), np.float32)                     # (K*D, L, B)
    got_b = np.transpose(got, (2, 1, 0))
    err = np.abs(got_b - want).max()
    tol = TOL[dtype]["atol"] * 4
    name = jnp.dtype(dtype).name
    print(f"blast_cat {H}x{W} D={D} B={B} {name}: max err {err:.2e} "
          f"(tol {tol:.2e}) {'OK' if err < tol else 'FAIL'}")


def main():
    print(f"backend={jax.default_backend()}")
    spot_sscan_dir(56, 56, 16, jnp.float32)
    spot_sscan_dir(56, 56, 16, jnp.bfloat16)
    spot_sscan_dir(128, 128, 16, jnp.bfloat16, direction=1)
    spot_blast(56, 56, 16, 128, jnp.bfloat16)
    spot_blast(14, 14, 87, 128, jnp.bfloat16)


if __name__ == "__main__":
    main()
