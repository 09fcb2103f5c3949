"""Device-trace the TRAINING step (fwd + bwd + AdamW) on the real TPU.

3 of the 5 BASELINE tracked configs are training configs, but every
trace so far profiled inference only — the quad VJP recomputes its scans
and the LGAG/CustomFfn kernels fall back to XLA in training, so the
backward hot list is different in kind. Buckets per trace_groups.

Run: python tools/trace_train.py [bf16|fp32 [batch]]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tools.trace_attr import trace_ops
from tools.trace_groups import bucket


def main():
    dtype_name = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    from ceigm_unet_tpu.models import build_model
    from ceigm_unet_tpu.train.trainstep import (create_train_state,
                                                make_train_step)
    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
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

    def one(st):
        st2, m = step(st, batch_data, rng, jnp.asarray(False))
        return st2, m["loss"]

    rows = trace_ops(one, state)
    total = sum(d for d, _, _ in rows)
    print(f"== train step {dtype_name} b{batch}: {total:.2f} ms device op "
          f"time")
    buckets = {}
    for d, n, ln in rows:
        b = bucket(n, ln)
        buckets[b] = buckets.get(b, 0.0) + d
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {d:8.3f}  {b}")
    fams = {}
    for d, n, _ in rows:
        fam = re.sub(r"\.\d+$", "", n)
        fams[fam] = fams.get(fam, 0.0) + d
    for f, d in sorted(fams.items(), key=lambda kv: -kv[1])[:20]:
        print(f"    {d:8.3f}  {f}")
    print("  -- top ops --")
    for d, n, ln in rows[:25]:
        print(f"    {d:8.3f}  {n[:34]:36s} {ln[:110]}")


if __name__ == "__main__":
    main()
