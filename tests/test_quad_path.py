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


def test_quadgroup_fuseproj_equivalence(monkeypatch):
    """CEIGM_FUSEPROJ fuses the xc/z in-projections into one GEMM —
    identical math, must match the split-GEMM path exactly."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="auto")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_FUSEPROJ", "0")
    a = np.asarray(jax.jit(m.apply)(params, x))
    monkeypatch.setenv("CEIGM_FUSEPROJ", "1")
    b = np.asarray(jax.jit(m.apply)(params, x))
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)


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


def test_quadgroup_prologue_equivalence(monkeypatch):
    """CEIGM_PROLOGUE fuses in-proj + dw3x3 + silu + dt chain into one
    kernel (ops/quad_prologue.py) — must match the unfused path (values
    and input grads)."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="pallas")
    params = m.init(jax.random.PRNGKey(0), x)
    loss = lambda q: jnp.sum(m.apply(params, q) ** 2)
    monkeypatch.setenv("CEIGM_PROLOGUE", "0")
    a = np.asarray(jax.jit(m.apply)(params, x))
    ga = np.asarray(jax.grad(loss)(x))
    monkeypatch.setenv("CEIGM_PROLOGUE", "1")
    b = np.asarray(jax.jit(m.apply)(params, x))
    gb = np.asarray(jax.grad(loss)(x))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(gb, ga, rtol=2e-4, atol=2e-4)


def test_flat_chain_equivalence(monkeypatch):
    """CEIGM_FLAT runs the block chains in the flat (B, L, C) token view
    (flatten once per stage/Front) — identical math to the 4-D chain."""
    from ceigm_unet_tpu.models.groupmamba import BlockMamba
    from ceigm_unet_tpu.models.emcad import Front
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))

    for mod, kw in ((BlockMamba, dict(dim=32, mlp_ratio=4.0)),
                    (Front, dict(dim=32, depth=2, drop_paths=(0.0, 0.0)))):
        m = mod(scan_backend="auto", **kw)
        if mod is BlockMamba:
            params = m.init(jax.random.PRNGKey(0), x)
            run = lambda: np.asarray(jax.jit(m.apply)(params, x))
        else:
            params = m.init(jax.random.PRNGKey(0), x)
            run = lambda: np.asarray(jax.jit(m.apply)(params, x))
        monkeypatch.setenv("CEIGM_FLAT", "0")
        a = run()
        monkeypatch.setenv("CEIGM_FLAT", "1")
        if mod is BlockMamba:
            # BlockMamba itself takes hw explicitly in flat mode
            flatx = x.reshape(2, 60, 32)
            b = np.asarray(jax.jit(
                lambda p, q: m.apply(p, q, hw=(6, 10)))(params, flatx))
            b = b.reshape(x.shape)
        else:
            b = run()
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6,
                                   err_msg=mod.__name__)


def test_flat_chain_encoder_equivalence(monkeypatch):
    """CEIGM_FLAT through the encoder stage loop (Pvt2Ffn unfused flat
    path included) matches the 4-D chain."""
    from ceigm_unet_tpu.models.groupmamba import GroupMamba
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    m = GroupMamba(stem_hidden_dim=8, embed_dims=(16, 32, 32, 32),
                   mlp_ratios=(2, 2, 2, 2), depths=(1, 1, 1, 1),
                   scan_backend="auto")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_FLAT", "0")
    a = jax.jit(m.apply)(params, x)
    monkeypatch.setenv("CEIGM_FLAT", "1")
    b = jax.jit(m.apply)(params, x)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa),
                                   rtol=1e-6, atol=1e-6)
