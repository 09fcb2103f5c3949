"""Module-level parity: the in-place NHWC quad-scan path vs the generic
row-layout path, for both SS2D flavors. The quad path activates when the
resolved scan backend is "pallas" (on CPU the kernel runs in interpret
mode), the generic path under "assoc" — same params, same input.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.models.ss2d import SS2D, QuadGroupSS2D


def _run(module_cls, kwargs, x):
    outs = {}
    for backend in ("assoc", "pallas"):
        m = module_cls(scan_backend=backend, **kwargs)
        params = m.init(jax.random.PRNGKey(0), x)
        outs[backend] = np.asarray(m.apply(params, x))
    return outs


def test_quadgroup_parity():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    outs = _run(QuadGroupSS2D, dict(dim=32), x)
    np.testing.assert_allclose(outs["pallas"], outs["assoc"],
                               rtol=2e-4, atol=2e-4)


def test_ss2d_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 24)).astype(np.float32))
    outs = _run(SS2D, dict(d_model=24, forward_type="v05_noz"), x)
    np.testing.assert_allclose(outs["pallas"], outs["assoc"],
                               rtol=2e-4, atol=2e-4)


def test_quadgroup_grad_parity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 16)).astype(np.float32))
    m_a = QuadGroupSS2D(dim=16, scan_backend="assoc")
    m_p = QuadGroupSS2D(dim=16, scan_backend="pallas")
    params = m_a.init(jax.random.PRNGKey(3), x)

    def loss(m):
        return lambda p, xx: jnp.sum(m.apply(p, xx) ** 2)

    ga = jax.grad(loss(m_a))(params, x)
    gp = jax.grad(loss(m_p))(params, x)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_p = jax.tree_util.tree_leaves(gp)
    for xa, xp in zip(flat_a, flat_p):
        np.testing.assert_allclose(np.asarray(xp), np.asarray(xa),
                                   rtol=5e-4, atol=5e-4)


def test_quadgroup_quant_close(monkeypatch):
    """CEIGM_QUANT=1 (int8 u/dt at the scan boundary, dynamic per-lane
    scales) tracks the bf16 path within int8 quantization error. The
    scan math past dequantization is identical, so the module output
    must agree to ~1% of its dynamic range."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="pallas")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_QUANT", "0")
    a = np.asarray(jax.jit(m.apply)(params, x))
    monkeypatch.setenv("CEIGM_QUANT", "1")
    b = np.asarray(jax.jit(m.apply)(params, x))
    scale = np.abs(a).max()
    assert np.abs(b - a).max() <= 0.02 * scale, (
        np.abs(b - a).max(), scale)


def test_quadgroup_quant_train_raises(monkeypatch):
    """CEIGM_QUANT=1 under differentiation fails LOUDLY with a
    descriptive message (the int8 scan kernel has no VJP) instead of a
    pallas differentiation error deep in the graph (advisor r4)."""
    import pytest
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="pallas")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_QUANT", "1")
    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
