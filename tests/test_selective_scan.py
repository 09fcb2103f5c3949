"""Differential tests for the selective-scan op.

Mirrors the reference test strategy (gm-unet/kernels/selective_scan/
test_selective_scan.py:366-505): forward output, last state, and all seven
gradients compared against an independent ground truth, across a shape /
dtype / flag matrix including a non-chunk-multiple seqlen (65) and the
production config d_state=1.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.selective_scan import selective_scan
from reference_scan import selective_scan_numpy

# dtype-dependent tolerances, following the reference table
# (test_selective_scan.py:398-401)
TOLS = {
    jnp.float32: dict(rtol=6e-4, atol=2e-3),
    jnp.bfloat16: dict(rtol=3e-2, atol=5e-2),
}
GRAD_TOLS = {
    jnp.float32: dict(rtol=6e-4, atol=3e-3),
    jnp.bfloat16: dict(rtol=6e-2, atol=1e-1),
}


def make_inputs(rng, batch=2, dim=24, N=1, L=64, groups=1, itype=jnp.float32,
                has_D=True, has_bias=True):
    u = jnp.asarray(rng.standard_normal((batch, dim, L)), itype)
    delta = jnp.asarray(0.5 * rng.standard_normal((batch, dim, L)), itype)
    A = jnp.asarray(-0.5 - rng.random((dim, N)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, groups, N, L)), itype)
    C = jnp.asarray(rng.standard_normal((batch, groups, N, L)), itype)
    D = jnp.asarray(rng.standard_normal(dim), jnp.float32) if has_D else None
    bias = (jnp.asarray(0.1 * rng.standard_normal(dim), jnp.float32)
            if has_bias else None)
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize("backend", ["ref", "assoc"])
@pytest.mark.parametrize("L", [64, 65, 256])
@pytest.mark.parametrize("N", [1, 8])
def test_forward_matches_numpy(backend, L, N):
    rng = np.random.default_rng(0)
    u, delta, A, B, C, D, bias = make_inputs(rng, L=L, N=N)
    y, last = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                             return_last_state=True, backend=backend)
    y_ref, h_ref = selective_scan_numpy(u, delta, A, B, C, D, bias,
                                        delta_softplus=True,
                                        return_last_state=True)
    np.testing.assert_allclose(y, y_ref, **TOLS[jnp.float32])
    np.testing.assert_allclose(last, h_ref.reshape(last.shape),
                               **TOLS[jnp.float32])


@pytest.mark.parametrize("groups", [1, 2])
@pytest.mark.parametrize("has_D", [True, False])
@pytest.mark.parametrize("has_bias", [True, False])
def test_forward_flags(groups, has_D, has_bias):
    rng = np.random.default_rng(1)
    u, delta, A, B, C, D, bias = make_inputs(
        rng, dim=16, N=4, L=96, groups=groups, has_D=has_D, has_bias=has_bias)
    y = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                       backend="assoc")
    y_ref = selective_scan_numpy(u, delta, A, B, C, D, bias,
                                 delta_softplus=True)
    np.testing.assert_allclose(y, y_ref, **TOLS[jnp.float32])


def test_3d_bc_shapes():
    """(batch, N, L)-shaped B/C are accepted as G=1 (reference API parity)."""
    rng = np.random.default_rng(2)
    u, delta, A, B, C, D, bias = make_inputs(rng, dim=8, N=4, L=32)
    y4 = selective_scan(u, delta, A, B, C, D, bias, backend="assoc")
    y3 = selective_scan(u, delta, A, B[:, 0], C[:, 0], D, bias,
                        backend="assoc")
    np.testing.assert_allclose(y3, y4, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("itype", [jnp.float32, jnp.bfloat16])
def test_oflex_out_dtype(itype):
    """out_dtype=float32 from low-precision input (oflex capability,
    reference selective_scan_oflex.cpp:164)."""
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, bias = make_inputs(rng, itype=itype)
    y = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                       backend="assoc", out_dtype=jnp.float32)
    assert y.dtype == jnp.float32
    y_ref = selective_scan_numpy(u, delta, A, B, C, D, bias,
                                 delta_softplus=True)
    np.testing.assert_allclose(y, y_ref, **TOLS[itype])


@pytest.mark.parametrize("backend", ["ref", "assoc"])
@pytest.mark.parametrize("N,groups", [(1, 1), (4, 2)])
def test_gradients_match_numerical(backend, N, groups):
    """All 7 gradients vs numerical differentiation of the numpy truth."""
    rng = np.random.default_rng(4)
    u, delta, A, B, C, D, bias = make_inputs(
        rng, batch=1, dim=4, N=N, L=24, groups=groups)

    def loss(u, delta, A, B, C, D, bias):
        y = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                           backend=backend)
        return jnp.sum(y * w)

    w = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)
    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, delta, A, B, C, D, bias)

    # numerical grads of the numpy ground truth
    args = [np.asarray(x, np.float64) for x in (u, delta, A, B, C, D, bias)]
    wn = np.asarray(w, np.float64)

    def loss_np(*a):
        return float(np.sum(
            selective_scan_numpy(*a, delta_softplus=True) * wn))

    eps = 1e-5
    for gi, g in enumerate(grads):
        x = args[gi]
        num = np.zeros_like(x)
        it = np.nditer(x, flags=["multi_index"])
        while not it.finished:
            idx = it.multi_index
            xp = [a.copy() for a in args]
            xm = [a.copy() for a in args]
            xp[gi][idx] += eps
            xm[gi][idx] -= eps
            num[idx] = (loss_np(*xp) - loss_np(*xm)) / (2 * eps)
            it.iternext()
        np.testing.assert_allclose(
            np.asarray(g, np.float64), num, rtol=2e-2, atol=2e-3,
            err_msg=f"grad argnum {gi}")


def test_grad_matches_autodiff_through_assoc():
    """custom_vjp backward == plain autodiff through associative_scan."""
    import importlib
    ss_mod = importlib.import_module("ceigm_unet_tpu.ops.selective_scan")
    rng = np.random.default_rng(5)
    u, delta, A, B, C, D, bias = make_inputs(rng, dim=16, N=4, L=128)
    w = jnp.asarray(rng.standard_normal(u.shape), jnp.float32)

    def loss_custom(*a):
        return jnp.sum(selective_scan(*a, delta_softplus=True,
                                      backend="assoc") * w)

    def loss_plain(u, delta, A, B, C, D, bias):
        y, _ = ss_mod._fwd_impl(u, delta, A, B, C, D, bias, True, "assoc",
                                jnp.float32)
        return jnp.sum(y * w)

    g1 = jax.grad(loss_custom, argnums=tuple(range(7)))(
        u, delta, A, B, C, D, bias)
    g2 = jax.grad(loss_plain, argnums=tuple(range(7)))(
        u, delta, A, B, C, D, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_long_sequence_stability():
    """L=4096 (the reference speed-harness length) stays finite and accurate."""
    rng = np.random.default_rng(6)
    u, delta, A, B, C, D, bias = make_inputs(rng, batch=1, dim=8, N=1, L=4096)
    y = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                       backend="assoc")
    y_ref = selective_scan_numpy(u, delta, A, B, C, D, bias,
                                 delta_softplus=True)
    assert np.all(np.isfinite(np.asarray(y)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-3, atol=1e-3)
