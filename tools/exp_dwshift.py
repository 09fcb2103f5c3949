"""Same-process model-level A/B: shift-tap depthwise conv (CEIGM_DWSHIFT)
vs conv_general_dilated on the quad-path small-C dwconvs.

Run on the real TPU: python tools/exp_dwshift.py [batch [hw]]
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


def run_variant(name: str, shift: bool, B: int, hw: int):
    os.environ["CEIGM_DWSHIFT"] = "1" if shift else "0"
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
    print(f"== {name}: total {total:.2f} ms", flush=True)
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {d:8.3f}  {b}")
    fams = {}
    for d, n, _ in rows:
        fam = re.sub(r"\.\d+$", "", n)
        fams[fam] = fams.get(fam, 0.0) + d
    for f, d in sorted(fams.items(), key=lambda kv: -kv[1])[:12]:
        print(f"    {d:8.3f}  {f}")
    return total


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    t_c = run_variant("conv ", shift=False, B=B, hw=hw)
    t_s = run_variant("shift", shift=True, B=B, hw=hw)
    print(f"A/B: conv {t_c:.2f} ms vs shift {t_s:.2f} ms "
          f"({'shift' if t_s < t_c else 'conv'} wins, "
          f"{abs(t_c - t_s):.2f} ms)")


if __name__ == "__main__":
    main()
