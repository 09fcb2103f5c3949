"""Production-shape kernel matrix: the quad scan kernels and the
LGAG tap-conv at the sizes and dtypes the real model runs.

The reference kernel suite sweeps seqlen 64..4096 x fp32/fp16/bf16 with
all gradients checked (gm-unet/kernels/selective_scan/
test_selective_scan.py:366-401, tolerance table :398-401). The rebuilt
kernels' production regimes are L=3136 (224-squared stage-1, 56x56) and
L=16384 (512-squared stage-1, 128x128) with bf16 inputs; this matrix pins
numerics there, forward AND backward, against an exact fp32
associative-scan reference. Tolerances are the reference's bf16/fp32 rows.

Runs in Pallas interpret mode on CPU (same kernel code path as TPU modulo
Mosaic lowering); a TPU spot-run of this file is recorded in
docs/STATUS.md.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.quad_scan import (
    sscan_dir)

# reference tolerance table (test_selective_scan.py:398-401)
TOL = {
    jnp.float32: dict(rtol=6e-4, atol=2e-3),
    jnp.bfloat16: dict(rtol=3e-2, atol=5e-2),
}
# weight-gradient row (rtolw/atolw :402, loosened per the has-z note)
TOLW = {
    jnp.float32: dict(rtol=1e-3, atol=1e-3),
    jnp.bfloat16: dict(rtol=3e-2, atol=5e-2),
}


def _order(H, W, direction):
    L = H * W
    rm = np.arange(L)
    cm = np.arange(L).reshape(H, W).T.ravel()
    return {1: rm, 2: cm, 3: rm[::-1], 4: cm[::-1]}[int(direction)]


def _assoc_scan(a, b, order):
    idx = jnp.asarray(np.asarray(order))
    inv = jnp.asarray(np.argsort(np.asarray(order)))

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a[:, idx], b[:, idx]), axis=1)
    return h[:, inv]


def _ref_sscan(u, dt, Bb, Cb, A, bias, Dv, H, W, direction):
    """fp32 reference of the fused d_state=1 selective scan."""
    f32 = lambda x: x.astype(jnp.float32)
    d = jax.nn.softplus(f32(dt) + f32(bias))
    a = jnp.exp(d * f32(A))
    b = d * f32(u) * f32(Bb)
    h = _assoc_scan(a, b, _order(H, W, direction))
    return f32(Cb) * h + f32(Dv) * f32(u)


def _inputs(H, W, C, dtype, seed=0, bc_scalar=False):
    rng = np.random.default_rng(seed)
    L = H * W
    B = 1
    shp = (B, L, 1 if bc_scalar else C)
    u = jnp.asarray(rng.standard_normal((B, L, C)), dtype)
    dt = jnp.asarray(0.5 * rng.standard_normal((B, L, C)), dtype)
    Bb = jnp.asarray(rng.standard_normal(shp), dtype)
    Cb = jnp.asarray(rng.standard_normal(shp), dtype)
    A = jnp.asarray(-np.exp(rng.standard_normal(C) * 0.5), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal(C), jnp.float32)
    return u, dt, Bb, Cb, A, bias, Dv


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("direction", [1, 2, 3, 4])
def test_sscan_dir_production_L3136(direction, dtype):
    """56x56 (224-squared stage-1), per-group width 16."""
    H = W = 56
    C = 16
    u, dt, Bb, Cb, A, bias, Dv = _inputs(H, W, C, dtype, seed=direction)
    Bb = jnp.broadcast_to(Bb, u.shape)
    Cb = jnp.broadcast_to(Cb, u.shape)
    got = np.asarray(sscan_dir(u, dt, Bb, Cb, A, bias, Dv, H, W, direction))
    want = np.asarray(_ref_sscan(u, dt, Bb, Cb, A, bias, Dv, H, W,
                                 direction))
    np.testing.assert_allclose(got, want, **TOL[dtype])


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_sscan_dir_grads_production_L3136(dtype):
    """All 7 cotangents at 56x56, vs autodiff of the assoc reference
    (the reference checks the same 7: test_selective_scan.py:484-502)."""
    H = W = 56
    C = 16
    direction = 2
    u, dt, Bb, Cb, A, bias, Dv = _inputs(H, W, C, dtype, seed=9)
    Bb = jnp.broadcast_to(Bb, u.shape)
    Cb = jnp.broadcast_to(Cb, u.shape)
    rng = np.random.default_rng(99)
    ct = jnp.asarray(rng.standard_normal((1, H * W, C)), jnp.float32)

    def loss(fn):
        def f(u, dt, Bb, Cb, A, bias, Dv):
            return jnp.sum(
                fn(u, dt, Bb, Cb, A, bias, Dv, H, W, direction)
                .astype(jnp.float32) * ct)
        return f

    gk = jax.grad(loss(sscan_dir), argnums=tuple(range(7)))(
        u, dt, Bb, Cb, A, bias, Dv)
    gr = jax.grad(loss(_ref_sscan), argnums=tuple(range(7)))(
        u, dt, Bb, Cb, A, bias, Dv)
    names = ("du", "ddt", "dB", "dC", "dA", "dbias", "dD")
    for n, a, b in zip(names, gk, gr):
        tol = TOLW[dtype] if n in ("dA", "dbias", "dD") else TOL[dtype]
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(
            a, b, rtol=tol["rtol"], atol=tol["atol"] * scale,
            err_msg=f"{n} @ L=3136 {jnp.dtype(dtype).name}")



def test_sscan_dir_smoke_L16384_bf16():
    """512-squared stage-1 regime: 128x128 bf16, forward + grads vs the
    assoc reference at bf16 tolerance (single direction — the long-L
    numeric stability claim, not the full matrix)."""
    H = W = 128
    C = 16
    direction = 1
    dtype = jnp.bfloat16
    u, dt, Bb, Cb, A, bias, Dv = _inputs(H, W, C, dtype, seed=64)
    Bb = jnp.broadcast_to(Bb, u.shape)
    Cb = jnp.broadcast_to(Cb, u.shape)
    got = np.asarray(sscan_dir(u, dt, Bb, Cb, A, bias, Dv, H, W, direction))
    want = np.asarray(_ref_sscan(u, dt, Bb, Cb, A, bias, Dv, H, W,
                                 direction))
    np.testing.assert_allclose(got, want, **TOL[dtype])

    ct = jnp.ones((1, H * W, C), jnp.float32)

    def loss(fn):
        def f(u, dt):
            return jnp.sum(fn(u, dt, Bb, Cb, A, bias, Dv, H, W, direction)
                           .astype(jnp.float32) * ct)
        return f

    gk = jax.grad(loss(sscan_dir), argnums=(0, 1))(u, dt)
    gr = jax.grad(loss(_ref_sscan), argnums=(0, 1))(u, dt)
    for n, a, b in zip(("du", "ddt"), gk, gr):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(
            a, b, rtol=TOL[dtype]["rtol"], atol=TOL[dtype]["atol"] * scale,
            err_msg=f"{n} @ L=16384 bf16")


def test_lgag_tapconv_bf16():
    """bf16 tap-compute regime of the fused LGAG kernel vs the fp32 XLA
    module path, loose tolerance (docs/PARITY.md numerics note — this is
    the regime the perf model actually runs)."""
    from ceigm_unet_tpu.models.emcad import LGAG
    from ceigm_unet_tpu.ops.tapconv import lgag_gate_eval

    rng = np.random.default_rng(0)
    C = 16
    m = LGAG(f_int=C // 2, groups=C // 2)
    g = jnp.asarray(rng.standard_normal((2, 14, 14, C)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 14, 14, C)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), g, x)
    bs = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(
            rng.random(v.shape).astype(np.float32)) * 0.3,
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}

    want = np.asarray(m.apply(variables, g, x))  # fp32 XLA path

    p = variables["params"]
    st = variables["batch_stats"]
    got = np.asarray(lgag_gate_eval(
        g.astype(jnp.bfloat16), x.astype(jnp.bfloat16),
        [(p[n]["kernel"], p[n]["bias"])
         for n in ("W_g_1", "W_g_3", "W_g_5", "W_x_1", "W_x_3", "W_x_5")],
        dict(scale=p["bn"]["scale"], bias=p["bn"]["bias"],
             mean=st["bn"]["mean"], var=st["bn"]["var"]),
        p["psi_conv"]["kernel"], p["psi_conv"]["bias"],
        dict(scale=p["psi_bn"]["scale"], bias=p["psi_bn"]["bias"],
             mean=st["psi_bn"]["mean"], var=st["psi_bn"]["var"])).astype(
            jnp.float32))
    # psi is a sigmoid in (0, 1); bf16 taps wiggle it by O(1e-2)
    np.testing.assert_allclose(got, want, rtol=3e-2,
                               atol=5e-2 * np.abs(want).max())
