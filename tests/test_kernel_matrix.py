"""Production-shape kernel matrix: the quad/planar scan kernels and the
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
    sscan_dir, sscan_planar_ln, _group_lanes)

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


def _planar_pack(u, dt, Bs, Cs, K, D, Dg):
    """Group tensors (B, L, K, D) + per-group scalars (B, L, K) -> padded
    planar (B, L, K*Dg) exactly as models/ss2d.py:_quad_planar lays out."""
    B, L = u.shape[:2]
    pad = ((0, 0), (0, 0), (0, 0), (0, Dg - D))
    up = jnp.pad(u, pad).reshape(B, L, K * Dg)
    dtp = jnp.pad(dt, pad).reshape(B, L, K * Dg)
    Bexp = jnp.broadcast_to(Bs[..., None], (B, L, K, Dg)).reshape(
        B, L, K * Dg)
    Cexp = jnp.broadcast_to(Cs[..., None], (B, L, K, Dg)).reshape(
        B, L, K * Dg)
    return up, dtp, Bexp, Cexp


def _ref_planar(u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b, H, W, dirs):
    """Per-group fp32 reference: fused scan then group-LN."""
    outs = []
    for k, dirn in enumerate(dirs):
        y = _ref_sscan(u[..., k, :], dt[..., k, :],
                       Bs[..., k:k + 1], Cs[..., k:k + 1],
                       A[k], bias[k], Dv[k], H, W, dirn)
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.var(y, axis=-1, keepdims=True)
        outs.append((y - mu) * jax.lax.rsqrt(var + 1e-5)
                    * ln_s[k] + ln_b[k])
    return jnp.stack(outs, axis=2)  # (B, L, K, D)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("HWD", [(56, 56, 16),    # 224-sq stage-1 L=3136
                                 (28, 28, 32),    # stage-2
                                 (14, 14, 87)])   # stage-3 (radix-3 lanes)
def test_planar_ln_production(HWD, dtype):
    H, W, D = HWD
    K = 4
    dirs = (1, 2, 3, 4)
    Dg = _group_lanes(D)
    rng = np.random.default_rng(D)
    B, L = 1, H * W
    u4 = jnp.asarray(rng.standard_normal((B, L, K, D)), dtype)
    dt4 = jnp.asarray(0.5 * rng.standard_normal((B, L, K, D)), dtype)
    Bs = jnp.asarray(rng.standard_normal((B, L, K)), dtype)
    Cs = jnp.asarray(rng.standard_normal((B, L, K)), dtype)
    A = jnp.asarray(-np.exp(rng.standard_normal((K, D)) * 0.5), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_s = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)

    up, dtp, Bexp, Cexp = _planar_pack(u4, dt4, Bs, Cs, K, D, Dg)
    got = sscan_planar_ln(up, dtp, Bexp, Cexp, A, bias, Dv,
                          (ln_s, ln_b), H, W, D, dirs)
    got4 = np.asarray(got, np.float32).reshape(B, L, K, Dg)[..., :D]
    pad = np.asarray(got, np.float32).reshape(B, L, K, Dg)[..., D:]
    want = np.asarray(_ref_planar(
        u4, dt4, Bs.astype(jnp.float32), Cs.astype(jnp.float32),
        A, bias, Dv, ln_s, ln_b, H, W, dirs))
    # LN output is O(1) by construction -> absolute tolerance is honest
    np.testing.assert_allclose(got4, want, **TOL[dtype])
    assert np.all(pad == 0.0), "pad lanes must stay zero for the out-proj"


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_planar_ln_grads_production(dtype):
    """Planar custom VJP vs autodiff of the per-group reference at
    stage-1 shape (56x56, D=16)."""
    H = W = 56
    D, K = 16, 4
    dirs = (1, 2, 3, 4)
    Dg = _group_lanes(D)
    assert Dg == D
    rng = np.random.default_rng(3)
    B, L = 1, H * W
    u4 = jnp.asarray(rng.standard_normal((B, L, K, D)), dtype)
    dt4 = jnp.asarray(0.5 * rng.standard_normal((B, L, K, D)), dtype)
    Bs = jnp.asarray(rng.standard_normal((B, L, K)), dtype)
    Cs = jnp.asarray(rng.standard_normal((B, L, K)), dtype)
    A = jnp.asarray(-np.exp(rng.standard_normal((K, D)) * 0.5), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_s = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_b = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, L, K, D)), jnp.float32)

    def loss_kernel(u4, dt4, Bs, Cs, A, bias, Dv, ln_s, ln_b):
        up, dtp, Bexp, Cexp = _planar_pack(u4, dt4, Bs, Cs, K, D, Dg)
        y = sscan_planar_ln(up, dtp, Bexp, Cexp, A, bias, Dv,
                            (ln_s, ln_b), H, W, D, dirs)
        y4 = y.astype(jnp.float32).reshape(B, L, K, Dg)[..., :D]
        return jnp.sum(y4 * ct)

    def loss_ref(u4, dt4, Bs, Cs, A, bias, Dv, ln_s, ln_b):
        y = _ref_planar(u4, dt4, Bs.astype(jnp.float32),
                        Cs.astype(jnp.float32), A, bias, Dv, ln_s, ln_b,
                        H, W, dirs)
        return jnp.sum(y * ct)

    args = (u4, dt4, Bs, Cs, A, bias, Dv, ln_s, ln_b)
    gk = jax.grad(loss_kernel, argnums=tuple(range(9)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(9)))(*args)
    names = ("du", "ddt", "dBs", "dCs", "dA", "dbias", "dD", "dls", "dlb")
    for n, a, b in zip(names, gk, gr):
        tol = TOLW[dtype] if n in ("dA", "dbias", "dD", "dls", "dlb") \
            else TOL[dtype]
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(
            a, b, rtol=tol["rtol"], atol=tol["atol"] * scale,
            err_msg=f"{n} planar @ 56x56 {jnp.dtype(dtype).name}")


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
