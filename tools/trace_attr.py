"""Device-trace op attribution on the tunneled TPU (the reliable way).

jax.profiler traces DO work through the axon relay — per-op device
durations beat the differential fori_loop timing (±20% noise) for
localizing layout copies and fusion failures.

Usage as a library:
    from tools.trace_attr import trace_ops
    rows = trace_ops(fn, *args, iters=3)   # list of (ms, name, long_name)

CLI: python tools/trace_attr.py quad|block|ffn|model [dim hw]
"""
from __future__ import annotations

import functools
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: full-model TPU compiles take ~10 min of
# single-core host time; repeat tool runs on an unchanged model hit the
# cache in seconds (dir is gitignored)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

print = functools.partial(print, flush=True)


def trace_ops(fn, *args, iters=3):
    """Run jitted fn under the profiler; return [(ms, name, long)] sorted."""
    f = jax.jit(fn)
    np.asarray(jax.device_get(jax.tree.leaves(f(*args))[0]))  # compile+warm
    tmp = tempfile.mkdtemp(prefix="jtrace_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                r = f(*args)
            np.asarray(jax.device_get(jax.tree.leaves(r)[0]))
        files = glob.glob(os.path.join(tmp, "**", "*.trace.json.gz"),
                          recursive=True)
        with gzip.open(files[0]) as fh:
            tr = json.load(fh)
        evs = tr.get("traceEvents", [])
        pids = {e["pid"]: e["args"].get("name", "") for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        rows = {}
        for e in evs:
            if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
                if e["name"].startswith("jit_"):
                    continue
                # bare-numeric names are PARENT grouping spans whose
                # duration covers their children (the r4 train trace's
                # "0/1/2" 84-ms rows) — counting them double-books the
                # step and mis-assigns ~84 ms to whatever bucket the
                # name happens to match (the r4 "unexplained ~91 ms
                # pallas bucket" was exactly this artifact)
                if e["name"].isdigit():
                    continue
                if e["name"] not in rows:
                    rows[e["name"]] = [0.0, e.get("args", {}).get(
                        "long_name", "")]
                rows[e["name"]][0] += e.get("dur", 0) / 1e3 / iters
        return sorted(((d, n, ln) for n, (d, ln) in rows.items()),
                      reverse=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def show(rows, top=28, label=""):
    tot = sum(d for d, _, _ in rows)
    print(f"== {label}: {tot:.3f} ms total device op time")
    for d, n, ln in rows[:top]:
        print(f"{d:7.3f} {n[:36]:38s} {ln[:100]}")


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "quad"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    hw = int(sys.argv[3]) if len(sys.argv) > 3 else 56
    B = 64
    DT = jnp.bfloat16
    if what == "model":
        from ceigm_unet_tpu.models import build_model
        model = build_model(num_classes=9, dtype=DT, scan_backend="auto")
        x = jnp.ones((B, 224, 224, 1), jnp.float32)
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
        rows = trace_ops(lambda q: model.apply(v, q), x)
        show(rows, top=60, label="full model")
        return
    from ceigm_unet_tpu.models.ss2d import QuadGroupSS2D
    from ceigm_unet_tpu.models.groupmamba import BlockMamba
    from ceigm_unet_tpu.models.layers import Pvt2Ffn
    mods = {
        "quad": QuadGroupSS2D(dim=dim, dtype=DT),
        "block": BlockMamba(dim=dim, mlp_ratio=8.0, dtype=DT),
        "ffn": Pvt2Ffn(hidden=dim * 8, dtype=DT),
    }
    m = mods[what]
    x = jnp.ones((B, hw, hw, dim), DT)
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    rows = trace_ops(lambda q: m.apply(v, q), x)
    show(rows, label=f"{what} dim={dim} hw={hw}")


if __name__ == "__main__":
    main()
