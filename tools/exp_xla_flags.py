"""XLA/libtpu flag sweep of the headline bench.

XLA flags bind at process start, so each candidate set runs bench.py in a
subprocess (the persistent compile cache keys on compile options, so sets
don't poison each other). Unknown flags make XLA error out at init — such
sets are reported as FAILED and skipped, not fatal.

Run on TPU: python tools/exp_xla_flags.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CANDIDATES = {
    "baseline": "",
    # bigger scoped VMEM lets the fusion emitter keep larger tiles resident
    # (v5e has 128 MiB VMEM; the default scoped budget is far smaller)
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    # scheduler variants (mostly collective-latency oriented, but changes
    # op ordering / overlap on single-chip graphs too)
    "lhs_off": "--xla_tpu_enable_latency_hiding_scheduler=false",
    # flip the reduce-window/bitcast fusion heuristics that shape the
    # FFN-tail mega-fusions
    "no_rwb": "--xla_tpu_rwb_fusion=false",
}


def run(tag: str, flags: str) -> float | None:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, cwd=ROOT, capture_output=True, text=True,
            timeout=2400)
    except subprocess.TimeoutExpired:
        print(f"{tag:10s} TIMEOUT")
        return None
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        val = json.loads(line)["value"]
    except Exception:
        print(f"{tag:10s} FAILED rc={out.returncode} "
              f"stderr_tail={out.stderr.strip().splitlines()[-1:]}")
        return None
    print(f"{tag:10s} {val:8.1f} slices/s   [{flags or 'no extra flags'}]")
    return val


def main():
    sets = sys.argv[1:] or list(CANDIDATES)
    results = {}
    for tag in sets:
        results[tag] = run(tag, CANDIDATES[tag])
    best = max((v, k) for k, v in results.items() if v is not None)
    print(f"best: {best[1]} ({best[0]:.1f} slices/s)")


if __name__ == "__main__":
    main()
