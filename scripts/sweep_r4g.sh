#!/usr/bin/env bash
# Round-4 probe queue G: AsyncHostEMA (host-side fp32 numpy decay, async D2H)
# as the TRUE-recipe EMA story for the 512px stages. Probe 0 measures the raw
# D2H rates + whether a blocking fetch overlaps dispatched compute through
# the axon relay (decides how much of the 0.8s bf16-params fetch hides).
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $*" >&2
  timeout 2400 python "$@" 2>&1 | tail -8
  echo "=== exit $? ===" >&2
}

run scripts/probe_d2h.py
run scripts/tune.py --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode async --steps 4
run scripts/tune.py --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe onehot \
    --ema --ema-mode async --steps 4
