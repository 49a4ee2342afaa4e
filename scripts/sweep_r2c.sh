#!/bin/bash
# Round-2 phase-3: split-dispatch grad accumulation probes (the scanned accum graph
# crashes the remote compile helper; this path compiles k small graphs instead).
# Waits for sweep_r2b to exit so the single chip is never shared.
cd "$(dirname "$0")/.."
while pgrep -f "bash scripts/sweep_r2b.sh" > /dev/null; do
  sleep 30
done
sleep 5
T() { timeout 2400 python scripts/tune.py "$@" || echo "FAILED: $*" >&2; }

# reference-semantics microbatching: per-device batch 256 (stage1), 128/256 (stage4)
T --stage res256_mask75 --remat dots --mb 64 --nu bf16 --accum 4 --accum-mode dispatch
T --stage res512_mask0 --remat dots --mb 8 --nu bf16 --accum 8 --accum-mode dispatch
T --stage res512_mask75 --remat dots --mb 16 --nu bf16 --accum 4 --accum-mode dispatch
T --stage res256_mask0 --remat dots --mb 16 --nu bf16 --accum 4 --accum-mode dispatch

echo "SWEEP R2C DONE" >&2
