#!/usr/bin/env bash
# Round-4 probe queue C (after sweep_r4b findings):
#   - stage-4 mb16 offload+drain measured 18.3 img/s: the 14.95G/15.75G graph
#     compiles to a memory-pressure schedule slower PER IMAGE than mb8, and
#     the drain serializes the EMA round-trip. mb16 retired.
#   - stage-3 mb32 offload+drain measured 38.6: the drained HostEMA
#     round-trip costs ~3s/cycle. In-HBM mb16 dispatch (69.4) keeps stage 3.
#   - Remaining stage-4 hope: mb8 K=32 offload with NO drain - peak ~12.5G +
#     2.33G enqueue-time flatten fits, and the transfers overlap the next
#     cycle's ~9s of grad compute.
# Probe 2 times the same cycle WITHOUT EMA = the overlap ceiling; if probe 1
# lands near probe 2, the EMA is fully hidden.
# Probe 3 traces the stage-4 K=1 step for the round-3 VERDICT item-3
# deliverable (convert chain / AdamW / cross-attn kv-padding attribution).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) tune $*" >&2
  timeout 2400 python scripts/tune.py "$@" 2>&1 | tail -12
  echo "=== exit $? ===" >&2
}

# 1: stage-4 lead candidate - mb8 K=32, offload EMA, transfers overlapped
run --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode offload --ema-drain never --steps 4

# 2: same cycle, no EMA - the overlap ceiling for probe 1
run --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --steps 4

# 3: fresh stage-4 trace post-lane-flash (VERDICT round-3 item 3)
run --stage res512_mask0 --remat attn_moe --mb 8 --nu bf16 --moe onehot \
    --profile
