"""pack/unpack group-boundary kernels: exact vs XLA transposes, VJPs
are each other, module path under CEIGM_PACK matches the default."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.pack import pack_groups, unpack_groups, _lb


@pytest.mark.parametrize("B,L,K,D", [(2, 48, 4, 16), (1, 49, 4, 8),
                                     (2, 3136, 4, 16), (1, 100, 2, 24)])
def test_pack_unpack_exact(B, L, K, D):
    rng = np.random.default_rng(L)
    x = jnp.asarray(rng.standard_normal((B, L, K * D)), jnp.float32)
    got = np.asarray(pack_groups(x, K, True))
    want = np.asarray(jnp.swapaxes(x.reshape(B, L, K, D), 1, 2))
    assert np.array_equal(got, want)
    back = np.asarray(unpack_groups(jnp.asarray(want), True))
    assert np.array_equal(back, np.asarray(x))


def test_pack_vjp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 20, 3 * 8)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((2, 3, 20, 8)), jnp.float32)
    _, vjp = jax.vjp(lambda v: pack_groups(v, 3, True), x)
    (dx,) = vjp(g)
    want = jnp.swapaxes(g, 1, 2).reshape(2, 20, 24)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(want))
    _, vjp_u = jax.vjp(lambda v: unpack_groups(v, True),
                       pack_groups(x, 3, True))
    (dy,) = vjp_u(x)
    want_u = jnp.swapaxes(x.reshape(2, 20, 3, 8), 1, 2)
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(want_u))


def test_lb_divisors():
    assert _lb(3136) == 784
    assert _lb(784) == 784
    assert _lb(196) == 196
    assert _lb(12544) == 896


def test_quadgroup_dtfuse_equivalence(monkeypatch):
    """CEIGM_DTFUSE collapses (x @ Wx_dt) @ Wdt into x @ (Wx_dt @ Wdt) —
    fp reassociation only, must match the two-GEMM path to fp32 eps."""
    from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="auto")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_DTFUSE", "0")
    a = np.asarray(jax.jit(m.apply)(params, x))
    monkeypatch.setenv("CEIGM_DTFUSE", "1")
    b = np.asarray(jax.jit(m.apply)(params, x))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_quadgroup_pack_equivalence(monkeypatch):
    from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="auto")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_PACK", "0")
    a = np.asarray(jax.jit(m.apply)(params, x))
    monkeypatch.setenv("CEIGM_PACK", "1")
    b = np.asarray(jax.jit(m.apply)(params, x))
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)

    def loss(p, xx):
        return jnp.sum(m.apply(p, xx) ** 2)

    gb = jax.grad(loss)(params, x)
    monkeypatch.setenv("CEIGM_PACK", "0")
    ga = jax.grad(loss)(params, x)
    for xa, xb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=1e-5, atol=1e-5)
