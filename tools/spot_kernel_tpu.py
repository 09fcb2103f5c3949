"""TPU spot-run of the production-shape kernel matrix.

tests/test_kernel_matrix.py runs in Pallas interpret mode on CPU (the
conftest forces it); this script executes representative cases of the
same differentials on the REAL TPU — Mosaic lowering included — and
prints max errors vs the fp32 associative-scan reference. Record the
output in docs/STATUS.md.

Run: python tools/spot_kernel_tpu.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ceigm_unet_tpu.ops.quad_scan import sscan_dir, sscan_planar_ln, \
    _group_lanes

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_kernel_matrix import (  # noqa: E402
    _inputs, _ref_sscan, _planar_pack, _ref_planar, TOL)


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


def spot_planar(H, W, D, dtype):
    K, dirs = 4, (1, 2, 3, 4)
    Dg = _group_lanes(D)
    rng = np.random.default_rng(D)
    B, L = 1, H * W
    u4 = jnp.asarray(rng.standard_normal((B, L, K, D)), dtype)
    dt4 = jnp.asarray(0.5 * rng.standard_normal((B, L, K, D)), dtype)
    Bs = jnp.asarray(rng.standard_normal((B, L, K)), dtype)
    Cs = jnp.asarray(rng.standard_normal((B, L, K)), dtype)
    A = jnp.asarray(-np.exp(rng.standard_normal((K, D)) * 0.5),
                    jnp.float32)
    bias = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_s = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    up, dtp, Bexp, Cexp = _planar_pack(u4, dt4, Bs, Cs, K, D, Dg)
    got = np.asarray(jax.jit(lambda *a: sscan_planar_ln(
        *a, (ln_s, ln_b), H, W, D, dirs))(
        up, dtp, Bexp, Cexp, A, bias, Dv), np.float32)
    got4 = got.reshape(B, L, K, Dg)[..., :D]
    want = np.asarray(jax.jit(lambda *a: _ref_planar(
        *a, A, bias, Dv, ln_s, ln_b, H, W, dirs))(
        u4, dt4, Bs.astype(jnp.float32), Cs.astype(jnp.float32)),
        np.float32)
    err = np.abs(got4 - want).max()
    tol = TOL[dtype]["atol"]
    name = jnp.dtype(dtype).name
    print(f"planar_ln {H}x{W} D={D} {name}: max err {err:.2e} "
          f"(tol {tol:.2e}) {'OK' if err < tol else 'FAIL'}")


def main():
    print(f"backend={jax.default_backend()}")
    spot_sscan_dir(56, 56, 16, jnp.float32)
    spot_sscan_dir(56, 56, 16, jnp.bfloat16)
    spot_sscan_dir(128, 128, 16, jnp.bfloat16, direction=1)
    spot_planar(56, 56, 16, jnp.bfloat16)
    spot_planar(14, 14, 87, jnp.bfloat16)


if __name__ == "__main__":
    main()
