#!/bin/bash
# Round-3 cache-warm queue (2026-08-18, post-relay-outage). The persistent
# compile cache was wiped with the container: every round-end bench rung would
# cold-compile (10-25 min each) AND this service epoch compile-OOMs the
# EMA-free K=1 graphs that the host-EMA legs need (stage-4 mb8 + stage-3 mb32
# both 500ed, tune_results.jsonl 14:27/14:33). Warm the graphs bench actually
# executes, highest schedule leverage first, including the in-step-EMA
# fallbacks bench now retries when the host-EMA graph fails.
# Strictly serial (two concurrent probes wedge the tunnel - PERF.md wave 4).
cd "$(dirname "$0")/.."

run() {
  echo "[sweep_r3d] >>> tune.py $* ($(date +%H:%M:%S))" >&2
  timeout 2400 python scripts/tune.py "$@" >&2
  echo "[sweep_r3d] <<< rc=$? ($(date +%H:%M:%S))" >&2
}

# 1: stage-4 in-step-EMA fallback graph (the measured 23.48 img/s config;
#    48% of schedule wall-clock rides on this rung not falling through)
run --stage res512_mask0 --remat attn_moe --mb 8 --moe onehot --ema
# 2: stage-3 EMA-phase in-step fallback (measured 64.7 img/s config)
run --stage res512_mask75 --remat attn_moe --mb 32 --moe onehot --ema
# 3-4: stage-1/2 K=1 legs (bench times K=1 before the dispatch leg)
run --stage res256_mask75 --remat attn_moe --mb 128 --moe onehot
run --stage res256_mask0 --remat attn_moe --mb 64 --moe onehot
# 5-6: dispatch-leg retries WITH the donated-accumulator apply (the read-only
#    acc residency runtime-OOMed stage-3 mb32 K=8 at 14:48 and stage-1 mb128
#    K=2 at 15:02 under the pre-fix tune.py)
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 --accum-mode dispatch --accum-dtype bf16
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 --accum-mode dispatch --accum-dtype bf16
# 7: stage-4 host-EMA retry under a fresh process epoch (if it compiles, bench
#    gets the faster recipe-cadence number; its ema_step graph is tiny)
run --stage res512_mask0 --remat attn_moe --mb 8 --moe onehot --ema --ema-interval 32

echo "[sweep_r3d] queue done $(date +%H:%M:%S)" >&2
