#!/usr/bin/env bash
# Pre-compile the shipped single-chip configs into the persistent JAX compile
# cache (VERDICT round-3 item 7: make cold-compile cost a managed artifact).
#
# Cold XL train-step graphs take 4-27 minutes EACH through this environment's
# remote compile service (the mb256 stage-1 recipe graph is the 27-minute
# worst case; Pallas-kernel graphs 12-23 min - PERF.md). Warmed reruns load
# from ~/.cache/mdt_jax_cache in seconds. Run this once after any change to
# the compute path, before benchmarking or training.
#
# CACHE INVALIDATION: the cache key is the optimized-HLO fingerprint. Any edit
# that changes a traced graph re-compiles exactly that graph:
#   - ops/ kernel sources (flash attention, moe_ffn, adaln) - invalidates
#     every stage that dispatches the kernel (512px stages for flash, all for
#     MoE),
#   - models/ or train/train_step.py structural changes,
#   - config changes that alter the graph: microbatch, remat policy,
#     moe_dispatch, accum mode/dtype, EMA on/off, param_flow_dtype.
# rm -rf ~/.cache/mdt_jax_cache forces a full re-warm. Compile-OOM
# projections differ across compile-service restarts (PERF.md): a rung that
# warmed under one service epoch can still be rejected under another - the
# bench ladders handle that by falling through.
#
# Usage:
#   scripts/warm_cache.sh                      # all 4 stages + sampling legs
#   scripts/warm_cache.sh res512_mask0         # one stage
#   WARM_SAMPLING=0 scripts/warm_cache.sh      # skip the sampling legs
set -uo pipefail
cd "$(dirname "$0")/.."

STAGES="${1:-res256_mask75,res256_mask0,res512_mask75,res512_mask0}"
echo "[warm_cache] compiling bench lead rungs for: ${STAGES}" >&2
MDT_BENCH_STEPS=1 \
MDT_BENCH_SAMPLING="${WARM_SAMPLING:-1}" \
MDT_BENCH_STAGES="${STAGES}" \
MDT_BENCH_BUDGET_S=86400 \
python bench.py >/dev/null  # huge budget: the warm pass must never trim rungs
rc=$?
echo "[warm_cache] bench warm pass exit ${rc}; cache contents:" >&2
du -sh "${HOME}/.cache/mdt_jax_cache" 2>/dev/null >&2 || true
exit "${rc}"
