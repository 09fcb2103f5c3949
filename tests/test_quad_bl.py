"""Batch-last quad-scan kernels (ops/quad_scan_bl.py) — differential
against the established (B, K, L, D) path (ops/quad_scan.py), which is
itself pinned to the reference scan semantics by tests/test_quad_scan.py.
Covers all 4 directions, odd channel counts (stage-3's D=87 class), both
dtypes, and shapes that exercise the chunked-carry grid.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceigm_unet_tpu.ops.quad_scan import sscan_quad_ln_cat
from ceigm_unet_tpu.ops.quad_scan_bl import sscan_quad_ln_cat_bl


def _mk(B, K, L, D, dtype, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((B, K, L, D)), dtype)
    dt = jnp.asarray(rng.standard_normal((B, K, L, D)) * 0.5, dtype)
    Bs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    Cs = jnp.asarray(rng.standard_normal((B, K, L)), jnp.float32)
    A = jnp.asarray(-np.abs(rng.standard_normal((K, D))) - 0.1,
                    jnp.float32)
    bias = jnp.asarray(rng.standard_normal((K, D)) * 0.1, jnp.float32)
    Dv = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal((K, D)),
                       jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal((K, D)), jnp.float32)
    return u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b


def _run_both(B, K, H, W, D, dtype, dirs=(1, 2, 3, 4), seed=0):
    L = H * W
    u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b = _mk(B, K, L, D, dtype, seed)
    want = sscan_quad_ln_cat(u, dt, Bs, Cs, A, bias, Dv,
                             (ln_s, ln_b), H, W, dirs)   # (B, L, K*D)
    u_bl = jnp.transpose(u, (1, 3, 2, 0))               # (K, D, L, B)
    dt_bl = jnp.transpose(dt, (1, 3, 2, 0))
    bs_bl = jnp.transpose(Bs, (1, 2, 0))                # (K, L, B)
    cs_bl = jnp.transpose(Cs, (1, 2, 0))
    got = sscan_quad_ln_cat_bl(u_bl, dt_bl, bs_bl, cs_bl, A, bias, Dv,
                               (ln_s, ln_b), H, W, dirs)  # (K*D, L, B)
    got_blkd = jnp.transpose(got.reshape(K * D, L, B), (2, 1, 0))
    return np.asarray(want), np.asarray(got_blkd)


@pytest.mark.parametrize("dirs", [(1, 2, 3, 4)])
def test_bl_matches_reference_f32(dirs):
    want, got = _run_both(2, 4, 6, 8, 5, jnp.float32, dirs)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bl_matches_reference_bf16():
    want, got = _run_both(2, 4, 8, 8, 16, jnp.bfloat16, seed=3)
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), rtol=3e-2,
                               atol=3e-2)


def test_bl_odd_channels():
    """Stage-3 class: D=87 — no lane padding in the batch-last kernel
    (channels live in an untiled outer dim)."""
    want, got = _run_both(1, 4, 7, 4, 87, jnp.float32, seed=5)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bl_chunked_carry():
    """Shapes big enough that the L (row-major) / W (column-major)
    chunking engages: force tiny chunk budget via large L with small
    B*D so the default budget does NOT chunk, then check exactness on a
    production-aspect shape where it does."""
    # H*W = 3136 (stage-1 L) with D=16, B=8: rm blocks chunk when the
    # operand exceeds the 2 MiB budget — at these sizes it does not, so
    # scale L up instead via H.
    want, got = _run_both(2, 4, 56, 56, 16, jnp.float32, seed=7)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_module_blast_matches(monkeypatch):
    """QuadGroupSS2D with CEIGM_BLAST=1 == the default cat path."""
    from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="pallas")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_BLAST", "0")
    a = np.asarray(jax.jit(m.apply)(params, x))
    monkeypatch.setenv("CEIGM_BLAST", "1")
    b = np.asarray(jax.jit(m.apply)(params, x))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)


def test_bl_grads_match_reference():
    """Gradients through the batch-last custom VJP == the established
    path's, for every input and parameter cotangent."""
    B, K, H, W, D = 2, 4, 6, 8, 5
    L = H * W
    dirs = (1, 2, 3, 4)
    u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b = _mk(B, K, L, D,
                                                 jnp.float32, seed=13)

    def loss_ref(args):
        u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b = args
        y = sscan_quad_ln_cat(u, dt, Bs, Cs, A, bias, Dv,
                              (ln_s, ln_b), H, W, dirs)
        return jnp.sum(y ** 2)

    def loss_bl(args):
        u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b = args
        u_bl = jnp.transpose(u, (1, 3, 2, 0))
        dt_bl = jnp.transpose(dt, (1, 3, 2, 0))
        bs_bl = jnp.transpose(Bs, (1, 2, 0))
        cs_bl = jnp.transpose(Cs, (1, 2, 0))
        y = sscan_quad_ln_cat_bl(u_bl, dt_bl, bs_bl, cs_bl, A, bias,
                                 Dv, (ln_s, ln_b), H, W, dirs)
        return jnp.sum(y ** 2)

    args = (u, dt, Bs, Cs, A, bias, Dv, ln_s, ln_b)
    g_ref = jax.grad(loss_ref)(args)
    g_bl = jax.grad(loss_bl)(args)
    names = ("u", "dt", "Bs", "Cs", "A", "bias", "Dv", "ln_s", "ln_b")
    for n, a, b in zip(names, g_ref, g_bl):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4,
            atol=2e-4 * max(1.0, float(np.abs(np.asarray(a)).max())),
            err_msg=n)


def test_dwconv_bl_matches_xla():
    """Batch-last depthwise conv == lax depthwise conv (fwd + grads)."""
    from ceigm_unet_tpu.ops.quad_scan_bl import dwconv_bl
    rng = np.random.default_rng(17)
    C, H, W, B = 6, 9, 7, 4
    x = jnp.asarray(rng.standard_normal((C, H, W, B)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)

    def ref(x, k, b):
        xn = jnp.transpose(x, (3, 1, 2, 0))        # (B, H, W, C)
        y = jax.lax.conv_general_dilated(
            xn, k, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return jnp.transpose(y, (3, 1, 2, 0))

    got = dwconv_bl(x, k, b, H, W)
    want = ref(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    loss_a = lambda args: jnp.sum(dwconv_bl(*args, H, W) ** 2)
    loss_b = lambda args: jnp.sum(ref(*args) ** 2)
    ga = jax.grad(loss_a)((x, k, b))
    gb = jax.grad(loss_b)((x, k, b))
    for n, a, bb in zip("xkb", ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-4, err_msg=n)


def test_module_blast2_matches(monkeypatch):
    """QuadGroupSS2D with CEIGM_BLAST=2 (fully transposed sandwich) ==
    the default cat path, forward and gradients."""
    from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 32)).astype(np.float32))
    m = QuadGroupSS2D(dim=32, scan_backend="pallas")
    params = m.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("CEIGM_BLAST", "0")
    a = np.asarray(jax.jit(m.apply)(params, x))
    ga = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    monkeypatch.setenv("CEIGM_BLAST", "2")
    b = np.asarray(jax.jit(m.apply)(params, x))
    gb = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(ga)[0],
            jax.tree_util.tree_flatten_with_path(gb)[0]):
        np.testing.assert_allclose(
            np.asarray(vb), np.asarray(va), rtol=3e-4,
            atol=3e-4 * max(1.0, float(np.abs(np.asarray(va)).max())),
            err_msg=jax.tree_util.keystr(pa))
