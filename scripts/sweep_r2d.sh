#!/bin/bash
# Round-2 phase-4: re-measure all stages with the flat expert-major MoE (new compile)
# + a fresh stage-1 profile to find the next bottleneck. Waits for sweep_r2c.
cd "$(dirname "$0")/.."
while pgrep -f "bash scripts/sweep_r2c.sh" > /dev/null; do
  sleep 30
done
sleep 5
T() { timeout 2400 python scripts/tune.py "$@" || echo "FAILED: $*" >&2; }

T --stage res256_mask75 --remat dots --mb 64 --nu bf16
T --stage res512_mask0 --remat dots --mb 8 --nu bf16
T --stage res256_mask0 --remat dots --mb 16 --nu bf16
T --stage res512_mask75 --remat dots --mb 16 --nu bf16

# what's the top cost now?
T --profile --stage res256_mask75 --remat dots --mb 64 --nu bf16
T --profile --stage res512_mask0 --remat dots --mb 8 --nu bf16

# the simplified layouts may also unblock the compile-500 configs
T --stage res256_mask75 --remat dots --mb 128 --nu bf16
T --stage res512_mask0 --remat dots --mb 16 --nu bf16

echo "SWEEP R2D DONE" >&2
