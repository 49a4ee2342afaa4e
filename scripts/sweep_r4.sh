#!/usr/bin/env bash
# Round-4 probe queue, ordered by weighted-number leverage. Strictly serial
# (a second TPU client wedges the relay - verify skill). Each probe appends
# to tune_results.jsonl; failures (OOM / compile 500) fall through.
#
#  1-2  stage-4 offload rungs: HostEMA frees the 2.33GB EMA -> mb16 + the
#       lighter dots_attn_moe remat, TRUE recipe cadence (K=16 dispatch).
#       flow16 first (bf16 param flow is a per-grad-graph transient in
#       dispatch mode - kills the per-remat-region fp32->bf16 convert chain).
#  3    stage-3 EMA-phase TRUE-recipe alternative WITHOUT host round-trips:
#       in-HBM EMA + dispatch needs the accumulator to fit NEXT TO the EMA
#       buffer - impossible at mb32 (measured OOM), untested at mb16.
#  4-6  flow16 dispatch legs for stages 1/2/3pre (the convert-chain saving
#       at every stage; whole-step flow16 lost to residency, dispatch-mode
#       flow16 is transient).
#  7-8  stage-4 fallbacks.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) tune $*" >&2
  timeout 2400 python scripts/tune.py "$@" 2>&1 | tail -12
  echo "=== exit $? ===" >&2
}

# 1-2: stage-4 lead candidates (offload EMA, recipe K=16 at mb16)
run --stage res512_mask0 --remat dots_attn_moe --mb 16 --accum 16 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --flow bf16 --steps 4
run --stage res512_mask0 --remat dots_attn_moe --mb 16 --accum 16 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --steps 4

# 3: stage-3 EMA-phase, in-HBM EMA + mb16 dispatch (no host round-trip)
run --stage res512_mask75 --remat attn_moe --mb 16 --accum 16 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --steps 4

# 4-6: flow16 dispatch legs, stages 1/2/3pre
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --flow bf16 --steps 6
run --stage res256_mask0 --remat attn_moe --mb 64 --accum 4 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --flow bf16 --steps 6
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --flow bf16 --steps 4

# 7-8: stage-4 fallbacks (attn_moe mb16 offload; dots mb8 offload)
run --stage res512_mask0 --remat attn_moe --mb 16 --accum 16 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --steps 4
run --stage res512_mask0 --remat dots_attn_moe --mb 8 --accum 32 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --steps 4
