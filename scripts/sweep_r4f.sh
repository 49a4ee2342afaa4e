#!/usr/bin/env bash
# Round-4 probe queue F: in-HBM bf16-EMA dispatch legs — the bench-leg
# candidates. The offload-EMA variants measured 18–21 img/s at stage 4
# (host round-trip dominates); the UNTRIED combination is the in-HBM bf16
# EMA tree (2.33GB) next to the donated bf16 accumulator: ledger
# params 4.66 + moments 4.66 + acc 2.33 + ema 2.33 = 13.98G + mb8 temps.
# Probe 1: stage-4 shipped-leg candidate (expect ~26.3 if it fits).
# Probe 2: stage-3 mb32 K=8 + EMA (mb16 K=16 measured 69.37; mb32 bare
#          was 69.9 — if the bigger temps fit, this is the better rung).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) tune $*" >&2
  timeout 2400 python scripts/tune.py "$@" 2>&1 | tail -6
  echo "=== exit $? ===" >&2
}

run --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --steps 4
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --steps 4
