"""Module-path attribution: join device-trace op durations with the
compiled HLO's op_name metadata, then aggregate by model module.

python tools/trace_mod.py [depth [batch [hw]]]   (full model, real TPU)
python tools/trace_mod.py [depth] --from-dump   (re-aggregate offline)

Raw (duration, op, module) rows are dumped to /tmp/trace_mod_rows.json so
different depths/filters can be recomputed without re-tracing.
"""
from __future__ import annotations

import functools
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.trace_attr import trace_ops

print = functools.partial(print, flush=True)


DUMP = "/tmp/trace_mod_rows.json"


def collect(B: int, hw: int = 224):
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    x = jnp.ones((B, hw, hw, 1), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    fn = lambda q: model.apply(v, q)

    compiled = jax.jit(fn).lower(x).compile()
    name2mod = {}
    pat = re.compile(r"%([\w.\-]+) = ")
    for ln in compiled.as_text().splitlines():
        m = pat.search(ln)
        if not m:
            continue
        mm = re.search(r'op_name="([^"]*)"', ln)
        if mm:
            p = re.sub(r"^jit\([^)]*\)/", "", mm.group(1))
            name2mod[m.group(1)] = p

    rows = trace_ops(fn, x)
    out = [(d, n, name2mod.get(n, "?")) for d, n, _ in rows]
    import json
    with open(DUMP, "w") as f:
        json.dump(out, f)
    return out


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if "--from-dump" in sys.argv:
        import json
        with open(DUMP) as f:
            rows = json.load(f)
    else:
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        hw = int(sys.argv[3]) if len(sys.argv) > 3 else 224
        rows = collect(B, hw)
    total = sum(d for d, _, _ in rows)
    mods = defaultdict(lambda: [0.0, 0])
    for d, n, p in rows:
        parts = [q for q in p.split("/") if q]
        key = "/".join(parts[:depth]) if parts else "?"
        mods[key][0] += d
        mods[key][1] += 1
    print(f"== total {total:.2f} ms, by module (depth {depth}):")
    for k, (d, n) in sorted(mods.items(), key=lambda kv: -kv[1][0]):
        if d < 0.05:
            continue
        print(f"  {d:8.3f}  x{n:4d}  {k}")


if __name__ == "__main__":
    main()
