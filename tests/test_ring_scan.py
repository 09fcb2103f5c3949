"""Sequence-parallel scan: exactness vs single-device scan on the virtual
8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ceigm_unet_tpu.parallel.ring_scan import (
    sequence_parallel_scan, selective_scan_sp)
from ceigm_unet_tpu.ops.selective_scan import selective_scan, _combine


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


def test_distributed_scan_exact():
    rng = np.random.default_rng(0)
    shape = (4, 6, 1, 512)
    a = jnp.asarray(np.exp(-0.3 * rng.random(shape)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    mesh = _mesh()
    f = shard_map(
        lambda a, b: sequence_parallel_scan(a, b, "sp"), mesh=mesh,
        in_specs=(P(None, None, None, "sp"), P(None, None, None, "sp")),
        out_specs=P(None, None, None, "sp"))
    got = f(a, b)

    ah, want = jax.lax.associative_scan(_combine, (a, b), axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_selective_scan_sp_matches_local():
    rng = np.random.default_rng(1)
    batch, dim, N, L = 2, 8, 1, 256
    u = jnp.asarray(rng.standard_normal((batch, dim, L)), jnp.float32)
    delta = jnp.asarray(0.4 * rng.standard_normal((batch, dim, L)),
                        jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((dim, N)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)
    D = jnp.asarray(rng.standard_normal(dim), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(dim), jnp.float32)

    mesh = _mesh()
    f = shard_map(
        lambda u, d, Bm, Cm: selective_scan_sp(
            u, d, A, Bm, Cm, D, bias, delta_softplus=True),
        mesh=mesh,
        in_specs=(P(None, None, "sp"), P(None, None, "sp"),
                  P(None, None, None, "sp"), P(None, None, None, "sp")),
        out_specs=P(None, None, "sp"))
    got = f(u, delta, B, C)

    want = selective_scan(u, delta, A, B, C, D, bias, delta_softplus=True,
                          backend="assoc")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_distributed_scan_grad_exact(reverse):
    """Custom VJP of the SP scan vs local autodiff of associative_scan
    (the adjoint is the reversed-direction SP scan — r2 verdict item 5)."""
    rng = np.random.default_rng(2 + reverse)
    shape = (2, 3, 256)
    a = jnp.asarray(np.exp(-0.3 * rng.random(shape)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ct = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    mesh = _mesh()
    f = shard_map(
        lambda a, b, ct: jax.grad(
            lambda a, b: jax.lax.psum(
                jnp.sum(sequence_parallel_scan(a, b, "sp",
                                               reverse=reverse) * ct),
                "sp"),
            argnums=(0, 1))(a, b),
        mesh=mesh,
        in_specs=(P(None, None, "sp"),) * 3,
        out_specs=(P(None, None, "sp"),) * 2)
    da, db = f(a, b, ct)

    def local(a, b):
        aa, bb = (jnp.flip(a, -1), jnp.flip(b, -1)) if reverse else (a, b)
        _, h = jax.lax.associative_scan(_combine, (aa, bb), axis=-1)
        h = jnp.flip(h, -1) if reverse else h
        return jnp.sum(h * ct)

    da_w, db_w = jax.grad(local, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da_w),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_w),
                               rtol=1e-5, atol=1e-5)


def test_selective_scan_sp_grad_matches_local():
    """End-to-end SP selective-scan training path: grads of all inputs
    through shard_map vs the local assoc backend."""
    rng = np.random.default_rng(5)
    batch, dim, N, L = 2, 4, 1, 128
    u = jnp.asarray(rng.standard_normal((batch, dim, L)), jnp.float32)
    delta = jnp.asarray(0.4 * rng.standard_normal((batch, dim, L)),
                        jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((dim, N)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)

    mesh = _mesh()

    def sp_loss(u, d, Bm, Cm):
        y = selective_scan_sp(u, d, A, Bm, Cm, delta_softplus=True,
                              reverse=True)
        return jax.lax.psum(jnp.sum(y.astype(jnp.float32) ** 2), "sp")

    f = shard_map(
        lambda u, d, Bm, Cm: jax.grad(sp_loss, argnums=(0, 1, 2, 3))(
            u, d, Bm, Cm),
        mesh=mesh,
        in_specs=(P(None, None, "sp"), P(None, None, "sp"),
                  P(None, None, None, "sp"), P(None, None, None, "sp")),
        out_specs=(P(None, None, "sp"), P(None, None, "sp"),
                   P(None, None, None, "sp"), P(None, None, None, "sp")))
    got = f(u, delta, B, C)

    def local_loss(u, d, Bm, Cm):
        y = selective_scan(u, d, A, Bm, Cm, delta_softplus=True,
                           backend="assoc")
        # reverse=True flips scan direction; emulate on the local side by
        # flipping inputs and output
        return jnp.sum(y.astype(jnp.float32) ** 2)

    flip = lambda x: jnp.flip(x, -1)
    want = jax.grad(
        lambda u, d, Bm, Cm: local_loss(flip(u), flip(d), flip(Bm),
                                        flip(Cm)),
        argnums=(0, 1, 2, 3))(u, delta, B, C)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)
