"""Headline benchmark: Synapse 224x224 inference slices/sec on one chip.

Prints ONE JSON line. Baseline target (BASELINE.json): 5000 slices/sec/chip
on TPU v5e; vs_baseline = value / 5000.

Timing method: on this environment's tunneled TPU, ``block_until_ready``
confirms enqueue, not execution — only a device->host fetch synchronizes.
We therefore time K and 2K chained iterations each ending in a scalar
fetch and report the differential (2K - K)/K, which cancels fetch latency
and dispatch overheads. Tunnel latency makes one differential noisy
(~±8% run-to-run); the reported value is the MEDIAN of several
differential pairs, with the spread printed to stderr (round-over-round
deltas must not be half noise — r2 verdict item 10).
"""
from __future__ import annotations

import json
import sys
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache (gitignored): repeat benches of an unchanged
# model skip the ~10-min single-core compile
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _run_chain(step, state0, iters):
    s = state0
    t0 = time.perf_counter()
    for _ in range(iters):
        s = step(s)
    np.asarray(jax.device_get(s[0][0, 0, 0, 0]))  # sync fetch
    return time.perf_counter() - t0


def _measure():
    from ceigm_unet_tpu.models import build_model

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # b128 measured +7.4% slices/s over b64 (tools/exp_batch.py r3:
    # 1228.7 vs 1144.5) — fixed per-step overheads amortize.
    # CEIGM_BENCH_BATCH overrides (batch-sweep probes).
    batch = int(os.environ.get("CEIGM_BENCH_BATCH", "128" if on_tpu
                               else "2"))
    k = 8 if on_tpu else 1

    model = build_model(num_classes=9, dtype=compute_dtype,
                        scan_backend="auto")
    x0 = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    # init must be jitted: eager dispatch is pathological over the remote
    # TPU tunnel (every init op pays round-trip latency)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0[:1])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 224, 224, 1)), jnp.float32)

    @jax.jit
    def step(state):
        x, acc = state
        logits = model.apply(variables, x)
        # chain: perturb the input with the output so iterations are
        # sequentially dependent and cannot be deduplicated
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
        print(f"bench: median of {pairs} pairs, per_iter="
              f"{per_iter * 1e3:.2f} ms, spread ±{spread * 100:.1f}% "
              f"[{', '.join(f'{s * 1e3:.2f}' for s in samples)}]",
              file=sys.stderr)
    return batch / per_iter


def main():
    # a headline number beats a stack trace: if a custom kernel fails to
    # lower/run on this toolchain, retry on progressively safer paths
    # (the env gates are read at trace time)
    fallbacks = [None, ("CEIGM_BLAST", "0"), ("CEIGM_LGAG", "0"),
                 ("CEIGM_CFFN", "0"), ("CEIGM_GS_BAND", "0"),
                 ("CEIGM_GS_FUSED", "0"), ("CEIGM_QUAD", "0")]
    slices_per_sec = None
    active = []
    for fb in fallbacks:
        if fb is not None:
            os.environ[fb[0]] = fb[1]
            active.append(fb[0])
            print(f"bench: retrying with {fb[0]}={fb[1]}", file=sys.stderr)
        try:
            slices_per_sec = _measure()
            break
        except Exception as e:  # noqa: BLE001
            print(f"bench: attempt failed: {type(e).__name__}: "
                  f"{str(e)[:500]}", file=sys.stderr)
    if slices_per_sec is None:
        raise SystemExit("bench: all fallback paths failed")
    # "fallbacks" must be [] on a healthy run: a non-empty list means a
    # custom kernel failed to lower on this toolchain and the number was
    # measured on a degraded path (r3 verdict: a silent retry would read
    # as an unexplained perf regression in a later round)
    print(json.dumps({
        "metric": "synapse_224_inference",
        "value": round(slices_per_sec, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / 5000.0, 4),
        "fallbacks": active,
    }))


if __name__ == "__main__":
    main()
