"""Aggregate a full-model device trace into cost categories.

Groups trace_attr rows by op family (stripping XLA's .N suffixes) and
into coarse buckets: pure-layout ops (copy/reshape/transpose/bitcast),
LayerNorm stat reductions (convert_reduce), pallas custom-calls,
convolutions, GEMMs, elementwise fusions. Use to track the round-3
boundary-copy/LN work.

Usage: python tools/trace_groups.py [batch [hw]]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_attr import trace_ops


def bucket(name: str, long: str) -> str:
    if re.match(r"^(copy|reshape|transpose|bitcast)", name):
        return "layout(copy/reshape/transpose)"
    if "convert_reduce" in name or ("reduce_fusion" in name):
        return "LN-stat reductions"
    if "custom-call" in long or name.startswith("_") or re.match(
            r"^(eucb|sscan|scan|quad|_lgag)", name):
        return "pallas custom-calls"
    if "convolution" in name or "convolution" in long.split("fusion(")[0]:
        return "convolutions"
    if name.startswith("fusion") and "convolution" in long:
        return "convolutions"
    if "dot" in long.split(" = ")[-1][:200] or name.startswith("wide"):
        return "gemm"
    return "other fusions"


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 224
    DT = jnp.bfloat16
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=DT, scan_backend="auto")
    x = jnp.ones((B, hw, hw, 1), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    rows = trace_ops(lambda q: model.apply(v, q), x)

    total = sum(d for d, _, _ in rows)
    fams, buckets = {}, {}
    for d, n, ln in rows:
        fam = re.sub(r"\.\d+$", "", n)
        fams[fam] = fams.get(fam, 0.0) + d
        b = bucket(n, ln)
        buckets[b] = buckets.get(b, 0.0) + d
    print(f"== total {total:.2f} ms (B={B}, {hw}^2)")
    print("-- buckets")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{d:8.3f}  {b}")
    print("-- top op families")
    for f, d in sorted(fams.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d:8.3f}  {f}")


if __name__ == "__main__":
    main()
