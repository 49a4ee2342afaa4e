#!/usr/bin/env bash
# Round-3 probe matrix (run on the TPU chip; results append to tune_results.jsonl).
# Each config runs in its own subprocess so a compile crash / OOM cannot kill
# the sweep. First compiles of kernel-bearing XL steps take 12-23 min through
# the remote compile service; reruns hit the persistent cache.
set -u
cd "$(dirname "$0")/.."

run() { timeout 2400 python scripts/tune.py "$@"; }

# fused-MoE dispatch comparison at the round-2 winning configs
run --stage res256_mask75 --remat attn_moe      --mb 128 --nu bf16 --moe onehot
run --stage res256_mask0  --remat dots_attn_moe --mb 16  --nu bf16 --moe onehot
run --stage res512_mask75 --remat dots_attn_moe --mb 16  --nu bf16 --moe onehot
run --stage res512_mask0  --remat dots_attn_moe --mb 8   --nu bf16 --moe onehot
run --stage res512_mask0  --remat dots_attn_moe --mb 16  --nu bf16 --moe onehot

# gather mode (flat gather + fused kernel): the T=1024 candidate
run --stage res512_mask0  --remat dots_attn_moe --mb 8   --nu bf16 --moe gather
run --stage res512_mask0  --remat dots_attn_moe --mb 16  --nu bf16 --moe gather
run --stage res512_mask75 --remat dots_attn_moe --mb 16  --nu bf16 --moe gather
run --stage res256_mask75 --remat attn_moe      --mb 128 --nu bf16 --moe gather

# stage-4 bigger-microbatch attempts under the lightest save policies
run --stage res512_mask0  --remat attn_moe      --mb 16  --nu bf16 --moe gather
run --stage res512_mask0  --remat dots_attn_moe_xlean --mb 16 --nu bf16 --moe gather
