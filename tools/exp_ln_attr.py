"""Attribute the LN-stat / copy / reshape buckets to specific ops.

Prints the top rows of each family with their long HLO names (shapes +
fused producers), for the current CEIGM_PLANAR setting. Use after a
model-level A/B to find WHICH module emits the batch-minor stat layouts.

Run: CEIGM_PLANAR=0 python tools/exp_ln_attr.py [batch [hw]]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_attr import trace_ops


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    x = jnp.ones((B, hw, hw, 1), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    rows = trace_ops(lambda q: model.apply(v, q), x)
    total = sum(d for d, _, _ in rows)
    print(f"== total {total:.2f} ms  (CEIGM_PLANAR="
          f"{os.environ.get('CEIGM_PLANAR', '1')})")
    for fam, pat in (("convert_reduce", r"convert_reduce|reduce_fusion"),
                     ("copy", r"^copy"),
                     ("reshape", r"^reshape"),
                     ("fusion", r"^fusion"),
                     ("transpose", r"^transpose|^bitcast")):
        sel = [(d, n, ln) for d, n, ln in rows if re.match(pat, n)]
        print(f"-- {fam}: {sum(d for d, _, _ in sel):.2f} ms "
              f"({len(sel)} ops)")
        for d, n, ln in sel[:12]:
            print(f"  {d:7.3f} {n[:28]:30s} {ln[:160]}")


if __name__ == "__main__":
    main()
