"""Sequence-parallel (context-parallel) selective scan across a device mesh.

The reference has no cross-device sequence handling (SURVEY.md §2.14/§5.7);
its CUDA kernel chunks L at 2048 *within* one GPU. Because the first-order
scan combine (a2, b2)∘(a1, b1) = (a2*a1, a2*b1 + b2) is associative, the
sequence axis can be sharded EXACTLY across chips: each shard scans locally,
shards exchange their (total-decay, final-state) summary pair, and each
shard folds in the exclusive prefix of its predecessors — one small
collective per scan, riding ICI.

Usage (inside shard_map over a mesh axis ``sp`` that shards L):

    h_local = sequence_parallel_scan(a_local, b_local, axis_name="sp")

The summary exchange uses ``lax.all_gather`` of the (a_tot, h_tot) pairs
(size = n_shards * rows, tiny compared to activations); the per-shard
exclusive prefix is then combined locally in log(n) arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ceigm_unet_tpu.ops.selective_scan import _combine, _scan_assoc


def sequence_parallel_scan(a: jnp.ndarray, b: jnp.ndarray,
                           axis_name: str,
                           reverse: bool = False) -> jnp.ndarray:
    """Exact distributed scan over the last axis sharded on ``axis_name``.

    a, b: local shards (..., L_local). Returns the local shard of the
    global inclusive scan h. ``reverse=True`` scans the global sequence
    back-to-front (local flip + predecessor set {shards > idx}) — no data
    movement beyond the same summary exchange.

    Differentiable: the custom VJP is the mathematical adjoint of the
    first-order recurrence — the reversed-direction SP scan of the
    shifted coefficients (same trick as ops/quad_scan.py:_scan2d_bwd),
    with the one-element global shifts exchanged over a ppermute ring.
    SP training, not just inference, goes through this path.
    """
    return _sp_scan(a, b, axis_name, reverse)


def _sp_shift(x, axis_name, forward: bool, fill: float):
    """Global one-element shift along the sharded last axis:
    ``forward=True`` -> x'_t = x_{t+1} (fill at the global end),
    ``forward=False`` -> x'_t = x_{t-1} (fill at the global start).
    One boundary lane rides the ppermute ring; everything else is local.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if forward:
        edge = x[..., :1]
        if n > 1:
            edge = jax.lax.ppermute(edge, axis_name,
                                    [(i, i - 1) for i in range(1, n)])
        edge = jnp.where(idx == n - 1, jnp.full_like(edge, fill), edge)
        return jnp.concatenate([x[..., 1:], edge], axis=-1)
    edge = x[..., -1:]
    if n > 1:
        edge = jax.lax.ppermute(edge, axis_name,
                                [(i, i + 1) for i in range(n - 1)])
    edge = jnp.where(idx == 0, jnp.full_like(edge, fill), edge)
    return jnp.concatenate([edge, x[..., :-1]], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sp_scan(a, b, axis_name, reverse):
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    if reverse:
        a = jnp.flip(a, -1)
        b = jnp.flip(b, -1)
        idx = n - 1 - idx

    # local scan and local summary
    ah, hh = jax.lax.associative_scan(_combine, (a, b), axis=-1)
    a_tot = ah[..., -1]
    h_tot = hh[..., -1]

    # gather every shard's summary: (n, ...) leading axis (device order);
    # for reverse, flip to scan order so the prefix composition below
    # walks predecessors in the order the scan visits them
    a_all = jax.lax.all_gather(a_tot, axis_name)
    h_all = jax.lax.all_gather(h_tot, axis_name)
    if reverse:
        a_all = jnp.flip(a_all, 0)
        h_all = jnp.flip(h_all, 0)

    # exclusive prefix over shards: combine summaries of shards < idx
    def step(carry, xs):
        a_c, h_c = carry
        a_i, h_i, i = xs
        take = i < idx
        a_n, h_n = _combine((a_c, h_c), (a_i, h_i))
        return (jnp.where(take, a_n, a_c), jnp.where(take, h_n, h_c)), None

    init = (jnp.ones_like(a_tot), jnp.zeros_like(h_tot))
    (a_pre, h_pre), _ = jax.lax.scan(
        step, init, (a_all, h_all, jnp.arange(n)))
    del a_pre

    # fold the predecessor state into the local scan:
    # h_t = h_t_local + (prod_{s<=t} a_s_local) * h_prefix
    h = hh + ah * h_pre[..., None]
    return jnp.flip(h, -1) if reverse else h


def _sp_scan_fwd(a, b, axis_name, reverse):
    h = _sp_scan(a, b, axis_name, reverse)
    return h, (a, h)


def _sp_scan_bwd(axis_name, reverse, res, gh):
    """Adjoint of h_t = a_t * h_{prev(t)} + b_t over the global order:
    g = scan in the REVERSED direction of (a successor-shifted, gh);
    da_t = g_t * h_{prev(t)}, db_t = g_t."""
    a, h = res
    a_next = _sp_shift(a, axis_name, forward=not reverse, fill=1.0)
    g = _sp_scan(a_next, gh, axis_name, not reverse)
    h_prev = _sp_shift(h, axis_name, forward=reverse, fill=0.0)
    return g * h_prev, g


_sp_scan.defvjp(_sp_scan_fwd, _sp_scan_bwd)


def selective_scan_sp_check(mesh) -> None:
    """Smoke check used by the driver's multi-chip dryrun: run a
    seq-sharded selective scan over ``mesh``'s first axis and assert it
    matches the unsharded result. Raises on mismatch."""
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from ceigm_unet_tpu.ops.selective_scan import selective_scan

    axis = mesh.axis_names[0]
    rng = np.random.default_rng(7)
    batch, dim, N, L = 2, 8, 1, 64 * mesh.devices.size
    u = jnp.asarray(rng.standard_normal((batch, dim, L)), jnp.float32)
    delta = jnp.asarray(0.4 * rng.standard_normal((batch, dim, L)),
                        jnp.float32)
    A = jnp.asarray(-0.5 - rng.random((dim, N)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((batch, 1, N, L)), jnp.float32)

    f = shard_map(
        lambda u, d, Bm, Cm: selective_scan_sp(
            u, d, A, Bm, Cm, delta_softplus=True, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis),
                  P(None, None, None, axis), P(None, None, None, axis)),
        out_specs=P(None, None, axis))
    got = f(u, delta, B, C)
    want = selective_scan(u, delta, A, B, C, delta_softplus=True,
                          backend="assoc")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def selective_scan_sp(u, delta, A, B, C, D=None, delta_bias=None,
                      delta_softplus: bool = False, axis_name: str = "sp",
                      reverse: bool = False):
    """Sequence-parallel selective scan: same API as
    :func:`ceigm_unet_tpu.ops.selective_scan.selective_scan`, with u/delta/
    B/C sharded along L over ``axis_name`` (call under shard_map).
    ``reverse=True`` scans the global sequence back-to-front (for the
    flipped cross-scan directions) without any data movement."""
    from ceigm_unet_tpu.ops.selective_scan import (
        _prep, _scan_coeffs, _emit_y)
    uf, dt, Af, Bf, Cf, Df, shapes = _prep(
        u, delta, A, B, C, D, delta_bias, delta_softplus)
    a, b = _scan_coeffs(uf, dt, Af, Bf, shapes)
    h = sequence_parallel_scan(a, b, axis_name, reverse=reverse)
    return _emit_y(h, Cf, uf, Df, shapes, u.dtype)
