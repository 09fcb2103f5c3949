"""512² single-chip inference benchmark (BASELINE config 5 class).

Full MSVMUNet forward at 512x512 bf16 — the long-sequence regime
(L = 16384 at stage 1). Prints one JSON line.
Run: python tools/bench_512.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from ceigm_unet_tpu.models import build_model
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    batch = 8 if on_tpu else 1
    k = 4 if on_tpu else 1

    model = build_model(num_classes=9, dtype=dtype, scan_backend="auto")
    x0 = jnp.zeros((batch, 512, 512, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0[:1])
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((batch, 512, 512, 1)), jnp.float32)

    @jax.jit
    def step(state):
        xx, acc = state
        logits = model.apply(variables, xx)
        nxt = xx + 1e-6 * logits[..., :1].astype(xx.dtype)
        return nxt, acc + jnp.float32(1)

    def run(n):
        s = (x, jnp.float32(0))
        t0 = time.perf_counter()
        for _ in range(n):
            s = step(s)
        np.asarray(jax.device_get(s[0][0, 0, 0, 0]))
        return time.perf_counter() - t0

    run(2)
    t1, t2 = run(k), run(2 * k)
    per = max((t2 - t1) / k, 1e-9)
    print(json.dumps({
        "metric": "synapse_512_inference",
        "value": round(batch / per, 2),
        "unit": "slices/sec/chip",
        "ms_per_slice": round(per / batch * 1e3, 2)}))


if __name__ == "__main__":
    main()
