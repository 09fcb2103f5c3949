"""Fused VMEM-resident CustomFfn kernel vs the XLA composition.

(The losing PVT2FFN fused formulations — hidden-shift v1 and
matmul-first v2, both measured-and-lost on hardware (STATUS r3/r4
postmortems) — were deleted in r5 along with their tests; the CustomFfn
kernel below is the surviving default-on member of the family.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

TOL = {jnp.float32: dict(rtol=2e-4, atol=2e-4),
       jnp.bfloat16: dict(rtol=3e-2, atol=5e-2)}


def _inputs(H, W, C, HID, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((1, H * W, C)), dtype)
    w1 = jnp.asarray(rng.standard_normal((C, HID)) * 0.05, dtype)
    b1 = jnp.asarray(rng.standard_normal(HID) * 0.1, jnp.float32)
    dwk = jnp.asarray(rng.standard_normal((3, 3, 1, HID)) * 0.2,
                      jnp.float32)
    dwb = jnp.asarray(rng.standard_normal(HID) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((HID, C)) * 0.05, dtype)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    return x, w1, b1, dwk, dwb, w2, b2


# --- fused CustomFfn (inception multi-scale) kernel -----------------------

from ceigm_unet_tpu.ops.ffn_pallas import (custom_ffn_fused, _cffn_ref,
                                           inception_composite)


def _cffn_inputs(H, W, C, HID, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x, w1, b1, dwk, dwb, w2, b2 = _inputs(H, W, C, HID, dtype, seed)
    g = HID // 8
    inck, incb = inception_composite(
        HID, g,
        jnp.asarray(rng.standard_normal((3, 3, 1, g)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((5, 5, 1, g)) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((7, 7, 1, g)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(g) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(g) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(g) * 0.1, jnp.float32),
        jnp.float32)
    return x, w1, b1, dwk, dwb, inck, incb, w2, b2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("HWC", [(8, 10, 16, 32),     # odd small
                                 (14, 14, 32, 64),    # f1-like aspect
                                 (8, 10, 16, 256)])   # packed taps P<HID
def test_cffn_forward(HWC, dtype):
    H, W, C, HID = HWC
    args = _cffn_inputs(H, W, C, HID, dtype, seed=C)
    got = np.asarray(custom_ffn_fused(*args, H, W, 3 * (HID // 8)),
                     np.float32)
    want = np.asarray(_cffn_ref(*args, H, W), np.float32)
    scale = max(1.0, np.abs(want).max())
    np.testing.assert_allclose(got, want, rtol=TOL[dtype]["rtol"],
                               atol=TOL[dtype]["atol"] * scale)


def test_cffn_grads():
    H, W, C, HID = 6, 9, 16, 32
    args = _cffn_inputs(H, W, C, HID, jnp.float32, seed=5)
    rng = np.random.default_rng(11)
    ct = jnp.asarray(rng.standard_normal((1, H * W, C)), jnp.float32)

    def loss(fn):
        return lambda *a: jnp.sum(fn(*a, H, W).astype(jnp.float32) * ct)

    gk = jax.grad(loss(custom_ffn_fused), argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss(_cffn_ref), argnums=tuple(range(9)))(*args)
    for n, a, b in zip("x w1 b1 dwk dwb inck incb w2 b2".split(), gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_custom_ffn_module_fused_matches_unfused(monkeypatch):
    """Module-level: CEIGM_CFFN path (interpret) vs the nn.Dense chain,
    same params, identical tree."""
    from ceigm_unet_tpu.models.layers import CustomFfn
    import ceigm_unet_tpu.models.layers as L
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 6, 9, 16)).astype(np.float32))
    m = CustomFfn(hidden=32)
    monkeypatch.setattr(L, "_use_fused_cffn", lambda: False)
    params = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(params, x))
    monkeypatch.setattr(L, "_use_fused_cffn", lambda: True)
    params2 = m.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    got = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-4)
