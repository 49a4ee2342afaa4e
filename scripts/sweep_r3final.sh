#!/bin/bash
# Round-3 final probe queue. Waits for the TPU relay to return, then runs the
# remaining single-chip probes STRICTLY SERIALLY (two concurrent probes wedge
# the tunnel for ~45 min - PERF.md round-3 wave 4), each in its own subprocess
# so a compile crash / OOM cannot kill the queue. Results append to
# tune_results.jsonl; drive with:  nohup bash scripts/sweep_r3final.sh &
#
# Queue rationale (PERF.md round-3 state of play):
#   P1 s4 attn_moe mb16 +EMA      - stage 4 is the weighted-number bottleneck;
#                                   round-2's "mb16 needs 19.8G" predates the
#                                   fused MoE kernels + attn_moe policy.
#   P2 s3 mb16 dispatch K=16 +EMA - EMA-phase accumulation OOMed at mb32 K=8;
#                                   mb16 halves activations, amortizes the
#                                   ~35ms optimizer over 16 microbatches.
#   P3-P5 dispatch legs s1/s2/s3  - re-measure with the jitted zero fix (the
#                                   eager-zeros runs understated by 8-15%).
#   P6 s4 mb16 dispatch K=16 +EMA - only meaningful if P1 fits.
#   P7 s2 attn_moe mb128 K=1      - mb ladder headroom check.
cd "$(dirname "$0")/.."

echo "[sweep_r3final] waiting for relay..." >&2
while true; do
  if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    # port up != TPU ready: require a real tiny computation to finish
    if timeout 240 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
      break
    fi
  fi
  sleep 60
done
echo "[sweep_r3final] relay UP at $(date +%H:%M:%S), starting queue" >&2

run() {
  echo "[sweep_r3final] >>> tune.py $* ($(date +%H:%M:%S))" >&2
  timeout 2400 python scripts/tune.py "$@" >&2
  echo "[sweep_r3final] <<< rc=$? ($(date +%H:%M:%S))" >&2
}

# P1: stage-4 bigger microbatch (the +3% that closes weighted >= 88)
run --stage res512_mask0 --remat attn_moe --mb 16 --moe onehot --ema
# P2: stage-3 EMA-phase accumulation at mb16
run --stage res512_mask75 --remat attn_moe --mb 16 --accum 16 --accum-mode dispatch --accum-dtype bf16 --ema
# P3-P5: dispatch recipe legs with the jitted zero fix
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 --accum-mode dispatch --accum-dtype bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --accum 4 --accum-mode dispatch --accum-dtype bf16
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 --accum-mode dispatch --accum-dtype bf16
# P6: stage-4 accumulation at mb16 (skip-on-OOM is fine; recorded either way)
run --stage res512_mask0 --remat attn_moe --mb 16 --accum 16 --accum-mode dispatch --accum-dtype bf16 --ema
# P7: stage-2 microbatch headroom
run --stage res256_mask0 --remat attn_moe --mb 128 --moe onehot

# P8-P11: bf16 param/grad flow (train_step param_flow_dtype) - kills the
# ~28-35ms/step of fp32<->bf16 converts in the stage-4 trace, halves grad
# traffic, and frees the fp32 grad transient (2.33GB) which may unlock
# accumulation next to the EMA buffer (stage 3/4 EMA phases).
run --stage res512_mask0 --remat attn_moe --mb 8 --moe onehot --flow bf16 --ema
run --stage res512_mask0 --remat attn_moe --mb 16 --moe onehot --flow bf16 --ema
run --stage res512_mask75 --remat attn_moe --mb 32 --moe onehot --flow bf16 --ema
run --stage res256_mask75 --remat attn_moe --mb 128 --moe onehot --flow bf16
# P12: stage-4 EMA-phase dispatch accumulation WITH the freed grad transient
run --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 --accum-mode dispatch --accum-dtype bf16 --flow bf16 --ema

# P13: the shipped recipe trains AS CONFIGURED on this chip (VERDICT round-2
# weak #4 acceptance): real train.py + tpu_v5e_1chip overlay on synthetic MDS.
echo "[sweep_r3final] >>> train_smoke_v5e res_256_pretrain ($(date +%H:%M:%S))" >&2
timeout 3000 python scripts/train_smoke_v5e.py --stage res_256_pretrain --steps 6 >&2
echo "[sweep_r3final] <<< rc=$? ($(date +%H:%M:%S))" >&2

echo "[sweep_r3final] queue done $(date +%H:%M:%S)" >&2
