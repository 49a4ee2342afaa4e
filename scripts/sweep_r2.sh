#!/bin/bash
# Round-2 throughput sweep (VERDICT.md next-round #1): retry the blocked levers -
# dots remat at bigger microbatches, bf16 second moment, grad-accum optimizer
# amortization - each config in its own subprocess so a compile crash / OOM cannot
# kill the sweep. Results append to tune_results.jsonl.
cd "$(dirname "$0")/.."
T() { timeout 2400 python scripts/tune.py "$@" || echo "FAILED: $*" >&2; }

# ground-truth fwd FLOPs per stage (XLA cost_analysis) for honest MFU accounting
T --fwd-flops --stage res256_mask75
T --fwd-flops --stage res256_mask0
T --fwd-flops --stage res512_mask75
T --fwd-flops --stage res512_mask0

# stage 4 (50% of recipe wall-clock at round-1 rates)
T --stage res512_mask0 --remat dots --mb 8 --nu bf16
T --stage res512_mask0 --remat dots --mb 16 --nu bf16
T --stage res512_mask0 --remat full --mb 16 --nu bf16
T --stage res512_mask0 --remat dots --mb 8 --nu bf16 --accum 4

# stage 1 (27% of wall-clock, 65% of steps)
T --stage res256_mask75 --remat full --mb 128 --nu bf16
T --stage res256_mask75 --remat dots --mb 64 --nu bf16
T --stage res256_mask75 --remat dots --mb 128 --nu bf16
T --stage res256_mask75 --remat full --mb 64 --nu bf16 --accum 4
T --stage res256_mask75 --remat none --mb 32 --nu bf16

# stage 3
T --stage res512_mask75 --remat dots --mb 32 --nu bf16
T --stage res512_mask75 --remat dots --mb 16 --nu bf16 --accum 2

# stage 2
T --stage res256_mask0 --remat dots --mb 32 --nu bf16
T --stage res256_mask0 --remat dots --mb 16 --nu bf16 --accum 4

echo "SWEEP DONE" >&2
