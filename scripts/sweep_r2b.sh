#!/bin/bash
# Round-2 phase-2 probes: wait for sweep_r2 to drain, then
#  (a) breakdown: fwd vs fwd+bwd vs full step - locates optimizer/backward overhead
#  (b) inner-K: K chained steps in ONE jit - pure device time vs dispatch overhead
#  (c) retries of configs that hit the flaky remote-compile 500
cd "$(dirname "$0")/.."
# wait for the first sweep SCRIPT (not just its current tune.py) to exit, so the
# two sweeps never overlap on the single TPU chip
while pgrep -f "bash scripts/sweep_r2.sh" > /dev/null; do
  sleep 30
done
sleep 5
T() { timeout 2400 python scripts/tune.py "$@" || echo "FAILED: $*" >&2; }

# where does the time go (stage 1 and stage 4 best configs)
T --breakdown --stage res256_mask75 --remat dots --mb 64
T --inner 8 --stage res256_mask75 --remat dots --mb 64 --nu bf16
T --breakdown --stage res512_mask0 --remat dots --mb 8
T --inner 8 --stage res512_mask0 --remat dots --mb 8 --nu bf16

# profiles (device op-time attribution; works only if the relay emits device planes)
T --profile --stage res256_mask75 --remat dots --mb 64 --nu bf16
T --profile --stage res512_mask0 --remat dots --mb 8 --nu bf16

# flaky-compile retries
T --stage res256_mask75 --remat dots --mb 128 --nu bf16
T --stage res512_mask0 --remat dots --mb 16 --nu bf16
T --stage res256_mask75 --remat dots --mb 64 --nu bf16 --accum 4

echo "SWEEP R2B DONE" >&2
