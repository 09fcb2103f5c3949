"""Sublane fused path vs generic path parity (CPU interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
from ceigm_unet_tpu.ops.scan_pallas import selective_scan_sublane


@pytest.mark.parametrize("H,W", [(8, 8), (6, 10)])
def test_quad_sublane_matches_generic(H, W):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, H, W, 32)), jnp.float32)
    m_fast = QuadGroupSS2D(dim=32, scan_backend="pallas")
    m_ref = QuadGroupSS2D(dim=32, scan_backend="assoc")
    v = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(v, x)
    y_fast = m_fast.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-4)


def test_sublane_scan_matches_math():
    """Direct check of the sublane kernel against a sequential recurrence."""
    rng = np.random.default_rng(1)
    Bn, L, C = 2, 70, 8
    u = jnp.asarray(rng.standard_normal((Bn, L, C)), jnp.float32)
    dt = jnp.asarray(0.3 * rng.standard_normal((Bn, L, C)), jnp.float32)
    Bv = jnp.asarray(rng.standard_normal((Bn, L, C)), jnp.float32)
    Cv = jnp.asarray(rng.standard_normal((Bn, L, C)), jnp.float32)
    A = jnp.asarray(-0.5 - rng.random(C), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    D = jnp.asarray(rng.standard_normal(C), jnp.float32)

    y = selective_scan_sublane(u, dt, Bv, Cv, A, bias, D)

    un, dtn = np.asarray(u, np.float64), np.asarray(dt, np.float64)
    dtn = np.logaddexp(0.0, dtn + np.asarray(bias))
    a = np.exp(dtn * np.asarray(A))
    b = dtn * un * np.asarray(Bv)
    h = np.zeros((Bn, C))
    want = np.zeros((Bn, L, C))
    for t in range(L):
        h = a[:, t] * h + b[:, t]
        want[:, t] = np.asarray(Cv)[:, t] * h + np.asarray(D) * un[:, t]
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)
