"""Training-step throughput on the real TPU (fwd + bwd + AdamW).

Reference config (train_synapse.py:102-114): batch 48, 224², 9 classes.
Times the fully jitted train step via a fori_loop-chained run (the only
reliable method on the tunneled TPU — docs/STATUS.md) at fp32 and bf16
compute. Prints one JSON line per dtype.

Run: python tools/bench_train.py
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

print = functools.partial(print, flush=True)


def bench_dtype(dtype_name):
    from ceigm_unet_tpu.models import build_model
    from ceigm_unet_tpu.train.trainstep import (create_train_state,
                                                make_train_step)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    batch = 48
    model = build_model(num_classes=9, dtype=dtype, scan_backend="auto")
    tx = optax.adamw(5e-4, weight_decay=1e-3)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 224, 224, 1), jnp.float32)
    state = jax.jit(lambda r: create_train_state(model, r, x0, tx))(rng)

    npr = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(npr.standard_normal((batch, 224, 224, 1)),
                             jnp.float32),
        "label": jnp.asarray(npr.integers(0, 9, (batch, 224, 224)),
                             jnp.int32),
    }
    step = make_train_step(model)

    @jax.jit
    def run(state, n):
        def body(i, carry):
            st, acc = carry
            st2, m = step(st, batch_data, jax.random.fold_in(rng, i),
                          jnp.asarray(False))
            return st2, acc + m["loss"]
        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    def once(n):
        t0 = time.perf_counter()
        st, acc = run(state, n)
        np.asarray(jax.device_get(acc))
        return time.perf_counter() - t0

    once(1)                       # compile + warm
    t1, t2 = once(3), once(6)
    per = max((t2 - t1) / 3, 1e-9)
    print(json.dumps({
        "metric": f"synapse_train_step_{dtype_name}",
        "value": round(per * 1e3, 1), "unit": "ms/step(b48)",
        "slices_per_sec": round(batch / per, 1)}))


if __name__ == "__main__":
    for d in ("fp32", "bf16"):
        bench_dtype(d)
