"""Trace-time context that routes the model's scan blocks through the
sequence-parallel shard_map island.

GSPMD partitions every op in the jitted model EXCEPT the selective scan's
recurrence over L — left alone, the SPMD partitioner all-gathers the full
L axis at each scan op (correct but unsharded, parallel/sp_model.py r3).
Entering :func:`scan_island` while *tracing* the model makes every
QuadGroupSS2D module call :func:`ceigm_unet_tpu.parallel.sp_ss2d.
quad_group_ss2d_sp` inside ``shard_map`` over the given mesh axis
instead of its local path: row-major directions scan the contiguous
H-shard directly, column-major via all_to_all, the dwconv halo rides a
ppermute — no all-gather of L anywhere (asserted on the compiled HLO by
tests/test_sp_model.py).

Usage (see sp_model.sp_forward):

    with sp_scan_island(mesh, "sp"):
        logits = jax.jit(model.apply)(variables, x)   # traced inside

The context is consulted at trace time only; it is a plain module global
(tracing is single-threaded within a jit).
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

from jax.sharding import Mesh

_ACTIVE: Optional[Tuple[Mesh, str]] = None


@contextmanager
def sp_scan_island(mesh: Mesh, axis: str = "sp"):
    """Route QuadGroupSS2D through the H-sharded shard_map island while
    tracing under this context."""
    global _ACTIVE
    if axis not in mesh.axis_names:
        raise ValueError(
            f"sp_scan_island: axis {axis!r} is not a mesh axis "
            f"(available: {tuple(mesh.axis_names)})")
    prev = _ACTIVE
    _ACTIVE = (mesh, axis)
    try:
        yield
    finally:
        _ACTIVE = prev


def active() -> Optional[Tuple[Mesh, str]]:
    return _ACTIVE
