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

    # DP EQUIVALENCE: the sharded step must match single-device numerics
    # (the DDP contract, train_synapse.py:211-221), not merely stay finite.
    # Uses the tiny encoder so this adds seconds, not a second flagship
    # compile; tests/test_dp_equivalence.py runs the same check over 3
    # steps with full tree comparison.
    def tiny_step(n: int, device_aug: bool = False):
        import optax
        m = build_model(num_classes=4, enc_name="gm_test",
                        scan_backend="assoc")
        # SGD, not Adam: first-step Adam normalizes by |g|+eps and blows
        # reassociation-level noise up to a full step (see
        # tests/test_dp_equivalence.py docstring)
        tx2 = optax.sgd(1e-2, momentum=0.9)
        st = create_train_state(m, jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 1), jnp.float32), tx2)
        msh = make_mesh(n)
        rp = NamedSharding(msh, P())
        st = jax.device_put(st, rp)
        rng0 = np.random.default_rng(5)
        if device_aug:
            # raw-intensity 64² slices; the step augments + resizes to
            # 32² + normalizes on device (tracked config 5)
            b = shard_batch(msh, {
                "image": jnp.asarray(
                    rng0.uniform(0, 1, (n_devices, 64, 64, 1)),
                    jnp.float32),
                "label": jnp.asarray(
                    rng0.integers(0, 4, (n_devices, 64, 64)), jnp.int32)})
        else:
            b = shard_batch(msh, {
                "image": jnp.asarray(
                    rng0.standard_normal((n_devices, 32, 32, 1)),
                    jnp.float32),
                "label": jnp.asarray(
                    rng0.integers(0, 4, (n_devices, 32, 32)), jnp.int32)})
        st2, mt = jax.jit(
            make_train_step(m, 0.4, 0.6,
                            device_aug_size=32 if device_aug else None),
            out_shardings=(rp, rp))(
            st, b, jax.random.PRNGKey(3), jnp.asarray(False))
        return st2, float(mt["loss"])

    def assert_equiv(s1, l1, sn, ln_):
        assert abs(l1 - ln_) <= 1e-5 * max(1.0, abs(l1)), (l1, ln_)
        for t1, tn in ((s1.params, sn.params),
                       (s1.batch_stats, sn.batch_stats)):
            for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(tn)):
                a, b = np.asarray(a), np.asarray(b)
                assert np.allclose(a, b, rtol=1e-5,
                                   atol=1e-8 + 1e-5 * np.abs(a).max())

    assert_equiv(*tiny_step(1), *tiny_step(n_devices))
    # tracked config 5: DP training with ON-DEVICE augmentation — the
    # fused aug tier runs inside the sharded step; per-sample keys are a
    # pure function of (rng, B), so 1-dev == n-dev bit-level semantics
    assert_equiv(*tiny_step(1, device_aug=True),
                 *tiny_step(n_devices, device_aug=True))


def main() -> None:
    import sys
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
    print("dryrun_multichip: OK")


if __name__ == "__main__":
    main()
