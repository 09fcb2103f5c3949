"""Multi-chip dry run: full DP training step over an n-device mesh.

This is the body of ``__graft_entry__.dryrun_multichip``. It must run in a
process whose JAX sees >= n devices — either real chips or a virtual CPU
mesh forced via ``JAX_PLATFORMS=cpu`` +
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` *before JAX
initializes*. The entry point takes care of re-exec'ing into such a
process when the current one is pinned to a different platform (the round-1
failure mode: the env pins ``JAX_PLATFORMS=axon`` → one tunneled TPU chip,
and the dryrun dispatched there and died on a libtpu version mismatch).

Capability parity note (SURVEY.md §2.14): the reference has no implemented
parallelism; its latent stack is Lightning DDP over NCCL. Parity here is
data-parallel SPMD (batch sharded over a "data" mesh axis, params
replicated, XLA-inserted psum over ICI) plus exact sequence-parallel scan
for 512² workloads (SURVEY §5.7), which this dryrun also exercises via a
seq-sharded selective scan on the same mesh.
"""
from __future__ import annotations


def run(n_devices: int) -> None:
    import os
    import jax
    # persistent compile cache: the full-model train-step compile on CPU is
    # ~10 min cold; warmed here so the driver's dryrun is seconds
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ceigm_unet_tpu.models import build_model
    from ceigm_unet_tpu.parallel import make_mesh, shard_batch
    from ceigm_unet_tpu.train.trainstep import (
        create_train_state, make_train_step, make_optimizer, cosine_lr)

    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"dryrun_multichip needs {n_devices} devices, found {len(devs)} "
            f"on platform {devs[0].platform!r}; force a virtual mesh with "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_"
            f"count={n_devices}")

    mesh = make_mesh(n_devices)
    model = build_model(num_classes=9, scan_backend="assoc")

    batch_per_dev = 2
    bsz = batch_per_dev * n_devices
    img = jnp.zeros((bsz, 32, 32, 1), jnp.float32)
    labels = jnp.zeros((bsz, 32, 32), jnp.int32)

    tx = make_optimizer(cosine_lr(5e-4, 1e-6, 300, 10), weight_decay=1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0), img[:1], tx)

    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    batch = shard_batch(mesh, {"image": img, "label": labels})

    step = make_train_step(model, ce_weight=0.4, dc_weight=0.6)
    jstep = jax.jit(step, out_shardings=(repl, repl))
    rng = jax.device_put(jax.random.PRNGKey(1), repl)
    state, metrics = jstep(state, batch, rng, jnp.asarray(False))
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    # one more step exercising the (traced) encoder-freeze branch
    state, metrics = jstep(state, batch, rng, jnp.asarray(True))
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))

    # sequence-parallel (context-parallel) scan over the same mesh:
    # L sharded across devices, summary-pair ring exchange — exact vs the
    # single-device scan (SURVEY §5.7; ref kernel chunking analogue:
    # selective_scan_oflex.cpp:218-220).
    from ceigm_unet_tpu.parallel.ring_scan import selective_scan_sp_check
    selective_scan_sp_check(mesh)


def main() -> None:
    import sys
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
    print("dryrun_multichip: OK")


if __name__ == "__main__":
    main()
