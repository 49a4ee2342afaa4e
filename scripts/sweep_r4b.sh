#!/usr/bin/env bash
# Round-4 follow-up probes (after sweep_r4.sh findings):
#   - flow16 dispatch legs runtime-OOM at EVERY stage -> retired.
#   - dots_attn_moe mb16 offload compile-OOMs at stage 4 -> retired.
#   - stage-3 mb16 in-state-EMA dispatch K=16 measured 69.4 img/s (probe 3).
#   - stage-4 attn_moe mb16 offload OOM'd INSIDE HostEMA.update: the flatten
#     graph's output buffers (full bf16 params copy) allocate at ENQUEUE time
#     next to the still-executing grad graph's temps. Fixed with a value-fetch
#     drain before the EMA enqueue (tune.py/bench.py, once per optimizer
#     update) -> retry is probe 1 here.
# Strictly serial (a second TPU client wedges the relay - verify skill).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) tune $*" >&2
  timeout 2400 python scripts/tune.py "$@" 2>&1 | tail -12
  echo "=== exit $? ===" >&2
}

# 1: stage-4 lead rung retry - attn_moe mb16 K=16 offload EMA + drain fix
run --stage res512_mask0 --remat attn_moe --mb 16 --accum 16 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --steps 4

# 2: stage-3 EMA phase at the mb32 rate - offload EMA frees room for the
#    accumulator at mb32 (in-HBM EMA blocked it; pre-EMA mb32 ran 69.8)
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --steps 4

# 3: stage-4 fallback - attn_moe mb8 K=32 offload (probe 8 of sweep_r4 was
#    dots mb8 without the drain fix)
run --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --steps 4
