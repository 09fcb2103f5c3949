#!/bin/sh
# Round-3 hardware measurement runbook — run when the axon tunnel is up.
# Strictly serialized (single-core host). Each step is independently
# killable; persistent compile cache makes repeats cheap.
#
#   sh tools/r3_measure.sh 2>&1 | tee /tmp/r3_measure.log
set -x
cd "$(dirname "$0")/.."

# 0. tunnel sanity
timeout 300 python -c "import jax; print(jax.devices())" || exit 1

# 1. headline after the session-3 fixes (fp32-GELU spill, grid-sample
#    rebuild, logits dtype) — median of 5 differential pairs
timeout 1800 python bench.py

# 2. roofline bound of the compiled graph (sizes remaining inefficiency)
timeout 1800 python tools/sol.py 64

# 3. opt-in variant A/Bs (trace-based, same-process off/on)
timeout 2400 python tools/exp_fuse_ab.py CEIGM_FUSEPROJ
timeout 2400 python tools/exp_fuse_ab.py CEIGM_PACK
timeout 2400 python tools/exp_fuse_ab.py CEIGM_DTFUSE

# 4. fresh per-op profile at HEAD for the next attack
timeout 2400 python tools/trace_attr.py model

# 5. batch sweep — fixed overheads argue for >64
timeout 2400 python tools/exp_batch.py 64 96 128

# 5b. kernel-matrix TPU spot-run (record in docs/STATUS.md — r2 verdict
#     item 6 wants the production-shape matrix spot-checked on hardware)
timeout 2400 python tools/spot_kernel_tpu.py || true

# 6. combined winners (flags compose independently; re-check jointly
#    before flipping defaults, then re-bench with the winning set)
CEIGM_FUSEPROJ=1 CEIGM_PACK=1 CEIGM_DTFUSE=1 \
    timeout 2400 python tools/exp_fuse_ab.py CEIGM_NOOP_SENTINEL || true
CEIGM_FUSEPROJ=1 CEIGM_PACK=1 CEIGM_DTFUSE=1 timeout 1800 python bench.py

# 7. round-status numbers: training step + 512-squared inference
timeout 2400 python tools/bench_train.py || true
timeout 2400 python tools/bench_512.py || true
