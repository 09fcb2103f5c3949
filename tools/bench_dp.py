"""Data-parallel inference benchmark — the runnable form of the
multi-chip 5k claim (r4 verdict #3 / STATUS §VERDICT).

Inference is embarrassingly data-parallel: params replicated, batch
sharded over the mesh's "data" axis, NO cross-device collectives in the
compiled module (asserted by tests/test_dp_inference.py on the 8-dev CPU
mesh). Per-chip throughput therefore multiplies: 1 chip ≈ 1,474 slices/s
at b128 224² bf16 ⇒ 4 chips ≈ 5,900 ≥ the 5,000 target.

On 1 visible chip this reproduces bench.py's headline with the identical
differential-timing method (enqueue-ack rules, CLAUDE.md); on an N-chip
host it IS the 5k demonstration. Prints ONE JSON line:

    {"metric": "synapse_224_dp_inference", "n_devices": N,
     "value": <total slices/s>, "per_chip": <value/N>, ...}

CEIGM_DP_DEVICES limits the mesh; CEIGM_BENCH_BATCH sets the PER-CHIP
batch (default 128 on TPU — the measured peak of the batch curve).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _run_chain(step, state0, iters):
    s = state0
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    np.asarray(jax.device_get(s[0][0, 0, 0, 0]))  # sync fetch
    return time.perf_counter() - t0


def measure():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ceigm_unet_tpu.models import build_model
    from ceigm_unet_tpu.parallel import make_mesh

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    n_dev = len(jax.devices())
    if os.environ.get("CEIGM_DP_DEVICES"):
        n_dev = min(n_dev, int(os.environ["CEIGM_DP_DEVICES"]))
    per_chip = int(os.environ.get("CEIGM_BENCH_BATCH",
                                  "128" if on_tpu else "2"))
    batch = per_chip * n_dev
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    k = 8 if on_tpu else 1

    mesh = make_mesh(n_dev)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    model = build_model(num_classes=9, dtype=compute_dtype,
                        scan_backend="auto")
    x0 = jnp.zeros((1, 224, 224, 1), jnp.float32)
    variables = jax.device_put(
        jax.jit(model.init)(jax.random.PRNGKey(0), x0), repl)

    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.standard_normal((batch, 224, 224, 1)), jnp.float32),
        shard)

    @jax.jit
    def step(state):
        x, acc = state
        logits = model.apply(variables, x)
        nxt = x + 1e-6 * logits[..., :1].astype(x.dtype)
        return nxt, acc + jnp.float32(1)

    state = (x, jnp.float32(0))
    _run_chain(step, state, 2)          # compile + warm
    pairs = 5 if on_tpu else 1
    samples = []
    for _ in range(pairs):
        t1 = _run_chain(step, state, k)
        t2 = _run_chain(step, state, 2 * k)
        samples.append(max((t2 - t1) / k, 1e-9))
    per_iter = float(np.median(samples))
    if len(samples) > 1:
        spread = (max(samples) - min(samples)) / (2 * per_iter)
        print(f"bench_dp: {n_dev} device(s), per-chip batch {per_chip}, "
              f"per_iter={per_iter * 1e3:.2f} ms, spread "
              f"±{spread * 100:.1f}%", file=sys.stderr)
    return batch / per_iter, n_dev, per_chip


def main():
    total, n_dev, per_chip = measure()
    print(json.dumps({
        "metric": "synapse_224_dp_inference",
        "n_devices": n_dev,
        "per_chip_batch": per_chip,
        "value": round(total, 2),
        "per_chip": round(total / n_dev, 2),
        "unit": "slices/sec",
        "vs_target_5000": round(total / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
