"""Pallas scan kernel (interpret mode on CPU) vs associative_scan, plus the
full selective_scan with backend='pallas' vs the numpy ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.scan_pallas import scan_pallas
from ceigm_unet_tpu.ops.selective_scan import selective_scan
from reference_scan import selective_scan_numpy


@pytest.mark.parametrize("shape", [(3, 5, 1, 64), (2, 4, 1, 65),
                                   (1, 8, 2, 300), (4, 2, 1, 4096)])
def test_scan_matches_sequential(shape):
    rng = np.random.default_rng(0)
    # realistic decay factors a = exp(dt*A), dt in softplus range
    a = jnp.asarray(np.exp(-0.2 * rng.random(shape)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = scan_pallas(a, b)

    def step(h, ab):
        h = ab[0] * h + ab[1]
        return h, h
    _, want = jax.lax.scan(
        step, jnp.zeros(shape[:-1]), (jnp.moveaxis(a, -1, 0),
                                      jnp.moveaxis(b, -1, 0)))
    want = jnp.moveaxis(want, 0, -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_strong_decay_no_nan():
    """Extreme decay must underflow to 0, not NaN (clamp path)."""
    a = jnp.full((2, 256), 1e-30, jnp.float32)
    b = jnp.ones((2, 256), jnp.float32)
    h = scan_pallas(a, b)
    assert np.all(np.isfinite(np.asarray(h)))
    np.testing.assert_allclose(np.asarray(h), 1.0, rtol=1e-5)


@pytest.mark.parametrize("L", [64, 65, 256])
def test_selective_scan_pallas_backend(L):
    rng = np.random.default_rng(1)
    batch, dim, N = 2, 8, 1
    u = jnp.asarray(rng.standard_normal((batch, dim, L)), jnp.float32)
    delta = jnp.asarray(0.5 * rng.standard_normal((batch, dim, L)),
                        jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((dim, N)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(dim), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(dim), jnp.float32)

    y = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                       backend="pallas")
    y_ref = selective_scan_numpy(u, delta, A, B, C, D, bias,
                                 delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-3, atol=1e-3)


def test_selective_scan_pallas_gradients():
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((1, 4, 96)), jnp.float32)
    delta = jnp.asarray(0.3 * rng.standard_normal((1, 4, 96)), jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((4, 1)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((1, 1, 1, 96)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((1, 1, 1, 96)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(4), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(4), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 4, 96)), jnp.float32)

    def loss(backend, *args):
        return jnp.sum(selective_scan(*args, delta_softplus=True,
                                      backend=backend) * w)

    g_p = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(7)))(
        u, delta, A, B, C, D, bias)
    g_a = jax.grad(lambda *a: loss("assoc", *a), argnums=tuple(range(7)))(
        u, delta, A, B, C, D, bias)
    for gp, ga in zip(g_p, g_a):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(ga),
                                   rtol=1e-3, atol=1e-4)
