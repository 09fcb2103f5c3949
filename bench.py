"""Headline benchmark: Synapse 224x224 inference slices/sec on one chip.

Prints ONE JSON line. Baseline target (BASELINE.json): 5000 slices/sec/chip
on TPU v5e; vs_baseline = value / 5000.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ceigm_unet_tpu.models import build_model

    platform = jax.devices()[0].platform
    compute_dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    batch = 64 if platform == "tpu" else 2
    iters = 20 if platform == "tpu" else 2

    model = build_model(num_classes=9, dtype=compute_dtype,
                        scan_backend="auto")
    x0 = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0[:1])

    @jax.jit
    def infer(variables, x):
        logits = model.apply(variables, x)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 224, 224, 1)), jnp.float32)

    # warmup / compile
    infer(variables, x).block_until_ready()
    infer(variables, x).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, x)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    slices_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "synapse_224_inference",
        "value": round(slices_per_sec, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(slices_per_sec / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
