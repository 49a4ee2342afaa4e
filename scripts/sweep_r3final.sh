#!/bin/bash
# Round-3 final probe queue. Waits for the TPU relay to return, then runs the
# remaining single-chip probes STRICTLY SERIALLY (two concurrent probes wedge
# the tunnel for ~45 min - PERF.md round-3 wave 4), each in its own subprocess
# so a compile crash / OOM cannot kill the queue. Results append to
# tune_results.jsonl; drive with:  nohup bash scripts/sweep_r3final.sh &
#
# Ordered by leverage on the schedule-weighted number (stage 4 first: 48% of
# wall-clock) - relay downtime may truncate the tail, so the head must carry
# the round. Probes double as compile-cache warmers: every bench.py lead rung
# (incl. the flow16 ones) has a matching probe here, so the round-end bench
# reruns cached executables instead of 12-25 min cold kernel compiles.
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

# ---- stage 4 (48% of schedule wall-clock; every point here moves weighted) --
# P1: bf16 param/grad flow at the current winner config (mb8) - kills the
# convert chains + halves grad traffic (PERF.md fifth wave)
run --stage res512_mask0 --remat attn_moe --mb 8 --moe onehot --flow bf16 --ema
# P2: bigger microbatch +EMA - round-2's "mb16 needs 19.8G" predates the fused
# MoE kernels + attn_moe policy; flow16 frees another 2.33GB
run --stage res512_mask0 --remat attn_moe --mb 16 --moe onehot --flow bf16 --ema
run --stage res512_mask0 --remat attn_moe --mb 16 --moe onehot --ema
# P3: EMA-phase dispatch accumulation WITH the freed fp32 grad transient
run --stage res512_mask0 --remat attn_moe --mb 8 --accum 32 --accum-mode dispatch --accum-dtype bf16 --flow bf16 --ema

# ---- stage 3 ----------------------------------------------------------------
# P4: flow16 at the measured winner (mb32 +EMA, 64.7 img/s)
run --stage res512_mask75 --remat attn_moe --mb 32 --moe onehot --flow bf16 --ema
# P5: EMA-phase dispatch accumulation (OOMed at mb32 K=8 without flow16)
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 --accum-mode dispatch --accum-dtype bf16 --flow bf16 --ema
run --stage res512_mask75 --remat attn_moe --mb 16 --accum 16 --accum-mode dispatch --accum-dtype bf16 --ema
# P6: pre-EMA phase dispatch leg with flow16 (bench PRE_EMA lead rung)
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 --accum-mode dispatch --accum-dtype bf16 --flow bf16

# ---- stages 1-2 recipe legs (jitted-zero fix + flow16 cache warm) -----------
# K=1 flow16 at the lead rungs (bench times K=1 BEFORE the dispatch leg, so
# these graphs must be warm too)
run --stage res256_mask75 --remat attn_moe --mb 128 --moe onehot --flow bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --moe onehot --flow bf16
# P7-P10: dispatch recipe legs; the eager-zeros runs understated by 8-15%
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 --accum-mode dispatch --accum-dtype bf16 --flow bf16
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 --accum-mode dispatch --accum-dtype bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --accum 4 --accum-mode dispatch --accum-dtype bf16 --flow bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --accum 4 --accum-mode dispatch --accum-dtype bf16
# P11: stage-2 microbatch headroom
run --stage res256_mask0 --remat attn_moe --mb 128 --moe onehot

# P12: the shipped recipe trains AS CONFIGURED on this chip (VERDICT round-2
# weak #4 acceptance): real train.py + tpu_v5e_1chip overlay on synthetic MDS.
echo "[sweep_r3final] >>> train_smoke_v5e res_256_pretrain ($(date +%H:%M:%S))" >&2
timeout 3000 python scripts/train_smoke_v5e.py --stage res_256_pretrain --steps 6 >&2
echo "[sweep_r3final] <<< rc=$? ($(date +%H:%M:%S))" >&2

echo "[sweep_r3final] queue done $(date +%H:%M:%S)" >&2
