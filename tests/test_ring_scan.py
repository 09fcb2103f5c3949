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
