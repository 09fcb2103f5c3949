"""Sequence-parallel QuadGroupSS2D: 512²-class feature map sharded over H
across the virtual 8-device mesh, exact vs the single-device module."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
from ceigm_unet_tpu.parallel.ring_scan import (selective_scan_sp,
                                               sequence_parallel_scan)
from ceigm_unet_tpu.parallel.sp_ss2d import quad_group_ss2d_sp


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


def test_reverse_sp_scan():
    mesh = _mesh()
    rng = np.random.default_rng(0)
    a = jnp.asarray(np.exp(-rng.random((4, 128))).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))

    f = shard_map(
        lambda a, b: sequence_parallel_scan(a, b, "sp", reverse=True),
        mesh=mesh, in_specs=(P(None, "sp"),) * 2, out_specs=P(None, "sp"))
    got = np.asarray(f(a, b))

    h = np.zeros((4, 128))
    state = np.zeros(4)
    for t in range(127, -1, -1):
        state = np.asarray(a)[:, t] * state + np.asarray(b)[:, t]
        h[:, t] = state
    np.testing.assert_allclose(got, h, rtol=1e-5, atol=1e-5)


def test_quad_ss2d_sp_matches_single_device():
    """Stage-1 block of a 512² input (H = W = 128), H-sharded 8 ways."""
    mesh = _mesh()
    rng = np.random.default_rng(1)
    B, H, W, C = 1, 128, 128, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    * 0.5)

    m = QuadGroupSS2D(dim=C, scan_backend="assoc")
    variables = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(variables, x))

    params = variables["params"]
    f = shard_map(
        lambda xx: quad_group_ss2d_sp(params, xx, axis_name="sp"),
        mesh=mesh, in_specs=P(None, "sp", None, None),
        out_specs=P(None, "sp", None, None))
    got = np.asarray(jax.jit(f)(x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_quad_ss2d_sp_grads_match_single_device():
    """Backward through the H-sharded block: input AND parameter
    gradients vs the single-device module (the ring scan's custom VJP,
    the all_to_all re-shards and the ppermute halos all differentiate).
    Smaller spatial than the forward test to keep CI time bounded."""
    mesh = _mesh()
    rng = np.random.default_rng(3)
    B, H, W, C = 1, 64, 64, 32
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    * 0.5)
    ct = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))

    m = QuadGroupSS2D(dim=C, scan_backend="assoc")
    variables = m.init(jax.random.PRNGKey(0), x)
    params = variables["params"]

    def loss_ref(p, xx):
        return jnp.sum(m.apply({"params": p}, xx) * ct)

    def loss_sp(p, xx):
        f = shard_map(
            lambda pp, q: quad_group_ss2d_sp(pp, q, axis_name="sp"),
            mesh=mesh, in_specs=(P(), P(None, "sp", None, None)),
            out_specs=P(None, "sp", None, None))
        return jnp.sum(f(p, xx) * ct)

    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gp_sp, gx_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1)))(params, x)

    np.testing.assert_allclose(np.asarray(gx_sp), np.asarray(gx_ref),
                               rtol=2e-4, atol=2e-4)
    flat_ref = jax.tree_util.tree_flatten_with_path(gp_ref)[0]
    flat_sp = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_flatten_with_path(gp_sp)[0]}
    assert len(flat_ref) == len(flat_sp)
    for k, w in flat_ref:
        key = jax.tree_util.keystr(k)
        g = np.asarray(flat_sp[key], np.float32)
        w = np.asarray(w, np.float32)
        atol = 2e-4 * max(1.0, np.abs(w).max())
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=atol,
                                   err_msg=key)
