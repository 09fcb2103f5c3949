"""Differential tests for the in-place NHWC quad-scan primitive.

Forward: all 4 directions vs a sequential NumPy scan over the direction's
pixel ordering. Backward: custom VJP vs JAX autodiff of an exact
associative_scan reference. Runs in Pallas interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.quad_scan import scan2d


def _orders(H, W):
    L = H * W
    rm = np.arange(L)
    cm = np.arange(L).reshape(H, W).T.ravel()
    return {1: rm, 2: cm, 3: rm[::-1], 4: cm[::-1]}


def _ref(a, b, order):
    B, L, C = a.shape
    h = np.zeros((B, L, C), np.float64)
    state = np.zeros((B, C), np.float64)
    for t in order:
        state = a[:, t] * state + b[:, t]
        h[:, t] = state
    return h


def _ref_assoc(a, b, order):
    """Exact JAX reference via associative_scan in the given pixel order."""
    idx = jnp.asarray(np.asarray(order))
    inv = jnp.asarray(np.argsort(np.asarray(order)))

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a2 * a1, a2 * b1 + b2

    ao, bo = a[:, idx], b[:, idx]
    _, h = jax.lax.associative_scan(combine, (ao, bo), axis=1)
    return h[:, inv]


@pytest.mark.parametrize("direction", [1, 2, 3, 4])
@pytest.mark.parametrize("HW", [(6, 10), (8, 8), (5, 7)])
def test_forward(direction, HW):
    H, W = HW
    rng = np.random.default_rng(direction)
    B, C = 2, 12
    a = np.exp(-rng.random((B, H * W, C))).astype(np.float32)
    b = rng.standard_normal((B, H * W, C)).astype(np.float32)
    got = np.asarray(scan2d(jnp.asarray(a), jnp.asarray(b), H, W, direction))
    want = _ref(a, b, _orders(H, W)[direction])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("direction", [1, 2, 3, 4])
def test_vjp(direction):
    H, W = 4, 6
    rng = np.random.default_rng(10 + direction)
    B, C = 2, 8
    a = jnp.asarray(np.exp(-rng.random((B, H * W, C))).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B, H * W, C)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((B, H * W, C)).astype(np.float32))
    order = _orders(H, W)[direction]

    def loss_new(a, b):
        return jnp.sum(scan2d(a, b, H, W, direction) * ct)

    def loss_ref(a, b):
        return jnp.sum(_ref_assoc(a, b, order) * ct)

    ga = jax.grad(loss_new, argnums=(0, 1))(a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


def test_quad_ln_cat_matches_stacked():
    """sscan_quad_ln_cat == lane-concat of the stacked API (values and
    gradients)."""
    from ceigm_unet_tpu.ops.quad_scan import sscan_quad_ln, sscan_quad_ln_cat
    rng = np.random.default_rng(7)
    B, K, H, W, C = 2, 4, 6, 10, 8
    L = H * W
    u = jnp.asarray(rng.standard_normal((B, K, L, C)), jnp.float32)
    dt = jnp.asarray(rng.standard_normal((B, K, L, C)) * 0.1, jnp.float32)
    Bs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    Cs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    A = jnp.asarray(-np.abs(rng.standard_normal((K, C))) - 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((K, C)) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((K, C)), jnp.float32)
    ln = (jnp.asarray(rng.standard_normal((K, C)), jnp.float32),
          jnp.asarray(rng.standard_normal((K, C)) * 0.1, jnp.float32))
    dirs = (1, 2, 3, 4)

    want = sscan_quad_ln(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, dirs)
    want = jnp.concatenate([want[:, k] for k in range(K)], axis=-1)
    got = sscan_quad_ln_cat(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, dirs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    ct = jnp.asarray(rng.standard_normal(got.shape), jnp.float32)
    f_cat = lambda *a: jnp.sum(sscan_quad_ln_cat(*a, H, W, dirs) * ct)
    ct_st = ct.reshape(B, L, K, C).transpose(0, 2, 1, 3)
    f_stk = lambda *a: jnp.sum(sscan_quad_ln(*a, H, W, dirs) * ct_st)
    ga = jax.grad(f_cat, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, dt, Bs, Cs, A, bias, Dv, ln)
    gb = jax.grad(f_stk, argnums=(0, 1, 2, 3, 4, 5, 6))(
        u, dt, Bs, Cs, A, bias, Dv, ln)
    for n, a, b in zip("u dt Bs Cs A bias Dv".split(), ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=n)

def test_quad_ln_merged_matches_pergroup(monkeypatch):
    """CEIGM_MERGESCAN=1 (one pallas call for all K groups) must match
    the per-group-call path exactly."""
    from ceigm_unet_tpu.ops.quad_scan import sscan_quad_ln
    rng = np.random.default_rng(11)
    B, K, H, W, C = 2, 4, 6, 10, 8
    L = H * W
    u = jnp.asarray(rng.standard_normal((B, K, L, C)), jnp.float32)
    dt = jnp.asarray(rng.standard_normal((B, K, L, C)) * 0.1, jnp.float32)
    Bs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    Cs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    A = jnp.asarray(-np.abs(rng.standard_normal((K, C))) - 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((K, C)) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((K, C)), jnp.float32)
    ln = (jnp.asarray(rng.standard_normal((K, C)), jnp.float32),
          jnp.asarray(rng.standard_normal((K, C)) * 0.1, jnp.float32))
    dirs = (1, 2, 3, 4)

    monkeypatch.setenv("CEIGM_MERGESCAN", "0")
    want = sscan_quad_ln(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, dirs)
    monkeypatch.setenv("CEIGM_MERGESCAN", "1")
    got = sscan_quad_ln(u, dt, Bs, Cs, A, bias, Dv, ln, H, W, dirs)
    # G-image batching in the merged kernel reassociates elementwise
    # fusion order (interpret mode) — ulp-level, not bit-exact
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
