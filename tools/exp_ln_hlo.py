"""Dump the optimized HLO around the expensive LN-stat fusions.

Compiles the full model for the TPU target and prints each big
convert_reduce fusion's definition (with its fused computation), its
operand producers, and its consumers — to see exactly what XLA fused,
which layouts it chose, and why the stat pass costs ~17x bandwidth.

Run: python tools/exp_ln_hlo.py [op_name_substring]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "convert_reduce_fusion.6"
    from ceigm_unet_tpu.models import build_model
    model = build_model(num_classes=9, dtype=jnp.bfloat16,
                        scan_backend="auto")
    x = jnp.ones((64, 224, 224, 1), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    compiled = jax.jit(lambda q: model.apply(v, q)).lower(x).compile()
    txt = compiled.as_text()
    print(f"HLO chars: {len(txt)}")

    lines = txt.splitlines()
    # print the fusion instruction line + the fused computation it calls
    for i, ln in enumerate(lines):
        if f"%{target} = " in ln or f" {target} = " in ln:
            print("== instruction:")
            print(ln.strip()[:2000])
            m = re.search(r"calls=%?([\w.\-]+)", ln)
            if m:
                comp = m.group(1)
                print(f"== fused computation {comp}:")
                grab = False
                for l2 in lines:
                    if re.match(rf"%?{re.escape(comp)} ", l2.strip()) or \
                       l2.strip().startswith(f"%{comp} "):
                        grab = True
                    if grab:
                        print(l2[:220])
                        if l2.strip() == "}":
                            break
            # consumers
            print("== consumers:")
            for l2 in lines:
                if target in l2 and f"%{target} = " not in l2 and \
                        f" {target} = " not in l2:
                    print(l2.strip()[:220])
            break
    else:
        # no exact match: list all convert_reduce fusions with shapes
        print("no exact match; all convert_reduce fusions:")
        for ln in lines:
            if re.search(r"%convert_reduce_fusion[.\d]* = ", ln):
                print(ln.strip()[:200])


if __name__ == "__main__":
    main()
