"""Full-model sequence(spatial)-parallel execution over a device mesh.

SURVEY §5.7 / §2.14: the 512²-class workload wants the *image* sharded
across chips, not just the batch. Two cooperating mechanisms:

1. **GSPMD spatial partitioning (this module)** — the whole MSVMUNet
   forward/backward jitted with the input H-sharded over the mesh and
   parameters replicated. XLA's SPMD partitioner inserts the halo
   exchanges for every spatial conv, turns global reductions (SE pooling,
   CAB attention pools, BatchNorm batch stats) into axis collectives, and
   differentiates the whole thing — the "annotate shardings, let XLA
   insert collectives" recipe, which is the TPU-native replacement for
   hand-written NCCL pipelines.
2. **Exact sequence-parallel scan (parallel/ring_scan.py + sp_ss2d.py)**
   — the selective scan's recurrence direction is the one op XLA cannot
   spatially partition on its own; the shard_map ring scan (now with a
   custom VJP) covers it exactly for production meshes, and
   ``quad_group_ss2d_sp`` runs a whole GroupMamba quad block H-sharded.

With ``scan_island=True`` (default) the one op GSPMD cannot partition —
the scan's recurrence over L — runs as a shard_map island inside the
jitted model (parallel/sp_context.py routes every QuadGroupSS2D through
sp_ss2d.quad_group_ss2d_sp): no all-gather of L anywhere in the compiled
module (asserted by tests/test_sp_model.py on the compiled HLO text).
``scan_island=False`` keeps the plain-GSPMD behavior (gather at the scan
op) for A/B and as a fallback for non-quad model variants.

Exactness (forward AND gradients) vs the single-device model is pinned by
tests/test_sp_model.py on the virtual 8-device CPU mesh.
"""
from __future__ import annotations

import functools
from contextlib import nullcontext
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ceigm_unet_tpu.parallel.sp_context import sp_scan_island


def sp_forward(model, variables, x, mesh: Mesh, axis: str = "sp",
               train: bool = False, scan_island: bool = True):
    """Run ``model.apply`` with ``x`` (B, H, W, C) H-sharded over
    ``mesh``'s ``axis`` and parameters replicated. Returns logits with
    the same H-sharding. Differentiable (GSPMD partitions the backward
    pass with the same shardings; the scan island's ring scan carries a
    custom VJP)."""
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))

    @functools.partial(
        jax.jit,
        static_argnames=("train",),
        out_shardings=NamedSharding(mesh, P(None, axis)))
    def f(v, q, train=False):
        return model.apply(v, q, train=train)

    ctx = sp_scan_island(mesh, axis) if scan_island else nullcontext()
    with ctx:
        return f(vs, xs, train=train)


def sp_value_and_grad(model, variables, x, labels, mesh: Mesh,
                      axis: str = "sp", ce_weight: float = 0.4,
                      dc_weight: float = 0.6, scan_island: bool = True):
    """Loss + parameter gradients of the DiceCE objective with the image
    H-sharded over the mesh — the training-direction counterpart of
    :func:`sp_forward` (512² DP+SP training building block)."""
    from ceigm_unet_tpu.losses import dice_ce_loss

    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis)))
    ls = jax.device_put(labels, NamedSharding(mesh, P(None, axis)))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=(repl, repl))
    def f(v, q, y):
        def loss_fn(params):
            logits = model.apply(
                {"params": params, **{k: v[k] for k in v
                                      if k != "params"}}, q)
            return dice_ce_loss(logits, y, ce_weight=ce_weight,
                                dc_weight=dc_weight)
        return jax.value_and_grad(loss_fn)(v["params"])

    ctx = sp_scan_island(mesh, axis) if scan_island else nullcontext()
    with ctx:
        return f(vs, xs, ls)
