"""Batch-size sweep of the headline inference config.

Fixed per-step costs (kernel grid overheads, small-stage dispatch) argue
for a larger batch than the historical b64; HBM-bound parts scale
linearly so slices/s should rise until capacity/latency effects bite.

Run: python tools/exp_batch.py [b1 b2 ...]   (default 64 96 128)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))


def run(batch: int) -> float:
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    x0 = jnp.zeros((batch, 224, 224, 1), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0[:1])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 224, 224, 1)), jnp.float32)

    @jax.jit
    def step(state):
        q, acc = state
        logits = model.apply(variables, q)
        return q + 1e-6 * logits[..., :1].astype(q.dtype), acc + 1.0

    def chain(iters):
        s = (x, jnp.float32(0))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = step(s)
        np.asarray(jax.device_get(s[0][0, 0, 0, 0]))
        return time.perf_counter() - t0

    chain(2)
    k = max(2, 512 // batch)
    samples = []
    for _ in range(5):
        t1 = chain(k)
        t2 = chain(2 * k)
        samples.append(max((t2 - t1) / k, 1e-9))
    per = float(np.median(samples))
    sl = batch / per
    print(f"b{batch}: {per * 1e3:8.2f} ms/step  {sl:8.1f} slices/s "
          f"[{', '.join(f'{s * 1e3:.1f}' for s in samples)}]")
    return sl


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 96, 128]
    best = max((run(b), b) for b in batches)
    print(f"best: b{best[1]} at {best[0]:.1f} slices/s")


if __name__ == "__main__":
    main()
