"""Device-mesh helpers for SPMD training.

The reference has no implemented parallelism (SURVEY.md §2.14); its latent
capability is Lightning DDP over NCCL. The TPU-native replacement is a 1-D
``jax.sharding.Mesh`` over the "data" axis: batches are sharded, parameters
replicated, and XLA inserts the psum gradient reduction over ICI when the
jitted train step is lowered — no hand-written collectives needed.
BatchNorm statistics become globally-synchronized for free because the
batch-axis mean is computed over a sharded axis.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh()``;
``jax.devices()`` then spans all hosts and the same code scales out.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"make_mesh({n_devices}) but only {len(devs)} device(s) "
                f"visible on platform {devs[0].platform!r} — a silently "
                f"truncated mesh would fake multi-chip coverage")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dimension sharding for input arrays."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sh = data_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
