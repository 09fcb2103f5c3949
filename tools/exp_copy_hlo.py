"""Attribute the layout-copy bucket: list every copy/transpose/reshape
instruction in the optimized HLO with its shape, layout, byte size, and
the jax op_name metadata (module path) that produced it, grouped by
module so the biggest emitters are visible.

The trace bucket 'layout(copy/reshape/transpose)' is ~17 ms of the 56 ms
forward; this maps those fusions back to model code.

Run: python tools/exp_copy_hlo.py [min_mib]
"""
from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8}

_INSTR = re.compile(
    r"%?((?:copy|transpose|reshape|bitcast)[\w.\-]*) = "
    r"(\w+)\[([\d,]*)\]({[^}]*})?")


def _bytes(dtype: str, dims: str) -> int:
    n = _DT_BYTES.get(dtype, 4)
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


def main():
    min_mib = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    x = jnp.ones((int(os.environ.get("CEIGM_B", "64")), 224, 224, 1), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    compiled = jax.jit(lambda q: model.apply(v, q)).lower(x).compile()
    txt = compiled.as_text()

    rows = []
    in_entry = False
    for ln in txt.splitlines():
        s = ln.strip()
        # only count top-level (scheduled) instructions, not fused bodies:
        # scheduled entry computation is the one declared with ENTRY
        if s.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and s == "}":
            in_entry = False
        if not in_entry:
            continue
        m = _INSTR.match(s)
        if not m:
            continue
        name, dtype, dims, layout = m.groups()
        mm = re.search(r'op_name="([^"]*)"', s)
        op_name = mm.group(1) if mm else "?"
        rows.append((_bytes(dtype, dims), name,
                     f"{dtype}[{dims}]{layout or ''}", op_name))

    rows.sort(key=lambda r: -r[0])
    total = sum(r[0] for r in rows)
    print(f"{len(rows)} copy/transpose/reshape/bitcast instrs, "
          f"{total / 2**30:.2f} GiB total (output bytes; x2 for r+w)")

    # group by a trimmed module path (drop the jit()/ prefix and any
    # trailing op detail) to find the emitting module
    groups = defaultdict(lambda: [0, 0])
    for b, name, shape, op_name in rows:
        p = re.sub(r"^jit\([^)]*\)/", "", op_name)
        parts = [q for q in p.split("/") if q]
        key = "/".join(parts[:4]) if parts else "?"
        groups[key][0] += b
        groups[key][1] += 1
    print("\n== by module path (top 25):")
    for key, (b, n) in sorted(groups.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"  {b / 2**20:9.1f} MiB  x{n:4d}  {key}")

    print(f"\n== individual instrs >= {min_mib} MiB:")
    for b, name, shape, op_name in rows:
        if b < min_mib * 2**20:
            break
        print(f"  {b / 2**20:9.1f} MiB  {name:28s} {shape}")
        print(f"             {op_name[:160]}")


if __name__ == "__main__":
    main()
