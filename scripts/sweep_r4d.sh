#!/usr/bin/env bash
# Round-4 probe queue D: MoE dispatch mode at stage 4.
# tune_results has NO non-onehot stage-4 record; round-3's own analysis says
# onehot's block-diagonal dispatch matmuls cost ~t/f (~50%) extra MoE FLOPs
# at T=1024 - exactly the stage-4 regime - while `gather` feeds the same
# fused Pallas expert FFN through a flat gather. MoE kernels are 70.7 ms of
# the 327.5 ms stage-4 step (trace 2026-08-19); a 1/3 dispatch saving is
# ~20 ms/step.
#   1. gather ceiling:   mb8 K=32 dispatch accumulation, no EMA (vs 26.5)
#   2. gather K=1 + EMA: the bench fallback-leg config (vs onehot 23.8)
#   3. hybrid K=1 + EMA: explicit-adjoint dispatch/combine, never measured
#      at this stage either
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) tune $*" >&2
  timeout 2400 python scripts/tune.py "$@" 2>&1 | tail -10
  echo "=== exit $? ===" >&2
}

run --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 \
    --accum-mode dispatch --accum-dtype bf16 --nu bf16 --moe gather --steps 4

run --stage res512_mask0 --remat attn_moe --mb 8 --nu bf16 --moe gather \
    --ema --ema-interval 32 --steps 10

run --stage res512_mask0 --remat attn_moe --mb 8 --nu bf16 --moe hybrid \
    --ema --ema-interval 32 --steps 10
