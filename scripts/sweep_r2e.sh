#!/bin/bash
# Round-2 phase-5: roofline calibration + final bench ladder verification.
cd "$(dirname "$0")/.."
while pgrep -f "bash scripts/sweep_r2d.sh" > /dev/null; do
  sleep 30
done
sleep 5
T() { timeout 2400 python scripts/tune.py "$@" || echo "FAILED: $*" >&2; }

# what does this chip actually deliver?
T --matmul-peak

# s3/s4 with the v3 kernel (if r2d's failed on the flaky compiler)
T --stage res512_mask75 --remat dots --mb 16 --nu bf16
T --stage res512_mask0 --remat dots --mb 8 --nu bf16
T --stage res512_mask0 --remat full --mb 8 --nu bf16

echo "SWEEP R2E DONE" >&2
