"""Same-process model-level A/B of an env-gated variant.

Run on the real TPU: python tools/exp_fuse_ab.py FLAG [batch [hw]]
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


def run_variant(flag: str, on: bool, B: int, hw: int):
    os.environ[flag] = "1" if on else "0"
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
    print(f"== {flag}={int(on)}: total {total:.2f} ms")
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
    flag = sys.argv[1] if len(sys.argv) > 1 else "CEIGM_BLAST"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    hw = int(sys.argv[3]) if len(sys.argv) > 3 else 224
    t_off = run_variant(flag, False, B, hw)
    t_on = run_variant(flag, True, B, hw)
    print(f"A/B {flag}: off {t_off:.2f} ms vs on {t_on:.2f} ms "
          f"({'ON wins' if t_on < t_off else 'OFF wins'}, "
          f"{abs(t_on - t_off):.2f} ms)")


if __name__ == "__main__":
    main()
