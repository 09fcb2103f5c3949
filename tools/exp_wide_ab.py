"""Same-process model-level A/B: wide-lane stages (CEIGM_WIDE) vs narrow.

Run on the real TPU: python tools/exp_wide_ab.py [batch [hw]]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_attr import trace_ops
from tools.trace_groups import bucket


def run_variant(name: str, wide: bool, B: int, hw: int):
    os.environ["CEIGM_WIDE"] = "1" if wide else "0"
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    x = jnp.ones((B, hw, hw, 1), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    rows = trace_ops(lambda q: model.apply(v, q), x)
    total = sum(d for d, _, _ in rows)
    buckets = {}
    for d, n, ln in rows:
        b = bucket(n, ln)
        buckets[b] = buckets.get(b, 0.0) + d
    print(f"== {name}: total {total:.2f} ms")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {d:8.3f}  {b}")
    fams = {}
    for d, n, _ in rows:
        fam = re.sub(r"\.\d+$", "", n)
        fams[fam] = fams.get(fam, 0.0) + d
    for f, d in sorted(fams.items(), key=lambda kv: -kv[1])[:10]:
        print(f"    {d:8.3f}  {f}")
    return total


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    t_n = run_variant("narrow", wide=False, B=B, hw=hw)
    t_w = run_variant("wide", wide=True, B=B, hw=hw)
    print(f"A/B: narrow {t_n:.2f} ms vs wide {t_w:.2f} ms "
          f"({'wide' if t_w < t_n else 'narrow'} wins, "
          f"{abs(t_n - t_w):.2f} ms)")


if __name__ == "__main__":
    main()
