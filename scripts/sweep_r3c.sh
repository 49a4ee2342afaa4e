#!/bin/bash
# Round-3 final-final probe queue (2026-08-18). flow16 is measured-dead on
# single-chip XL (bf16 param copy outweighs grad savings: stage-1 mb128 OOM
# +598M, stage-4 mb8+EMA OOM +1.61G), so every probe here is non-flow. The
# new lever is recipe-faithful EMA cadence on the K=1 fallback legs: one EMA
# update per 256 per-rank images via lax.cond (optim.ema_update), saving
# ~11ms/step of param+EMA HBM traffic at the stages where accumulation OOMs.
# Strictly serial; each probe in its own subprocess.
cd "$(dirname "$0")/.."

run() {
  echo "[sweep_r3c] >>> tune.py $* ($(date +%H:%M:%S))" >&2
  timeout 2400 python scripts/tune.py "$@" >&2
  echo "[sweep_r3c] <<< rc=$? ($(date +%H:%M:%S))" >&2
}

# 1: stage-4 NEW bench lead behavior (K=1 fallback, EMA every 256/8=32 steps)
run --stage res512_mask0 --remat attn_moe --mb 8 --moe onehot --ema --ema-interval 32
# 2: stage-3 EMA-phase leg (EMA every 256/32=8 steps)
run --stage res512_mask75 --remat attn_moe --mb 32 --moe onehot --ema --ema-interval 8
# 3: stage-3 pre-EMA dispatch leg (bench PRE_EMA lead rung, post-jitted-zero fix)
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 --accum-mode dispatch --accum-dtype bf16
# 4-5: stage-1/2 dispatch recipe legs (post-jitted-zero fix)
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 --accum-mode dispatch --accum-dtype bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --accum 4 --accum-mode dispatch --accum-dtype bf16
# 6: shipped recipe trains AS CONFIGURED on this chip (train.py + v5e overlay)
echo "[sweep_r3c] >>> train_smoke_v5e res_256_pretrain ($(date +%H:%M:%S))" >&2
timeout 3000 python scripts/train_smoke_v5e.py --stage res_256_pretrain --steps 6 >&2
echo "[sweep_r3c] <<< rc=$? ($(date +%H:%M:%S))" >&2

echo "[sweep_r3c] queue done $(date +%H:%M:%S)" >&2
