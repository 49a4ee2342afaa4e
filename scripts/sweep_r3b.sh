#!/bin/bash
# Round-3 probe queue, reordered after the flow16 stage-4 OOM finding
# (2026-08-18): with the EMA buffer resident, bf16 param/grad flow is a hard
# compile-OOM (17.36G vs 15.75G at mb8), so the 512px EMA-phase flow16 probes
# are dropped and the queue leads with the rungs that decide bench.py ladder
# ORDER. Strictly serial (concurrent probes wedge the tunnel - PERF.md wave 4);
# each probe in its own subprocess so a crash cannot kill the queue.
cd "$(dirname "$0")/.."

run() {
  echo "[sweep_r3b] >>> tune.py $* ($(date +%H:%M:%S))" >&2
  timeout 2400 python scripts/tune.py "$@" >&2
  echo "[sweep_r3b] <<< rc=$? ($(date +%H:%M:%S))" >&2
}

# A: stage-4 NEW lead rung (mb16 +EMA, non-flow) - unmeasured; fused MoE
# kernels + attn_moe may fit where round-2's 19.8G projection predates them.
# Stage 4 is 48% of schedule wall-clock; +5% here moves weighted by ~2.5%.
run --stage res512_mask0 --remat attn_moe --mb 16 --moe onehot --ema

# B/C: do flow16 K=1 legs WIN at the no-EMA stages? (these decide whether the
# stage-1/2 flow16 lead rungs stay in bench.py; no EMA buffer -> the bf16
# param copy has headroom). Also warms the bench lead-rung caches.
run --stage res256_mask75 --remat attn_moe --mb 128 --moe onehot --flow bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --moe onehot --flow bf16

# D: stage-3 pre-EMA dispatch legs - non-flow (known-fit, post-jitted-zero fix)
# then flow16 (PRE_EMA lead rung in bench.py).
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 --accum-mode dispatch --accum-dtype bf16
run --stage res512_mask75 --remat attn_moe --mb 32 --accum 8 --accum-mode dispatch --accum-dtype bf16 --flow bf16

# E: stage-1/2 dispatch recipe legs (post-jitted-zero fix; the eager-zeros
# runs understated by 8-15%) - non-flow first, flow16 if B/C won.
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 --accum-mode dispatch --accum-dtype bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --accum 4 --accum-mode dispatch --accum-dtype bf16
run --stage res256_mask75 --remat attn_moe --mb 128 --accum 2 --accum-mode dispatch --accum-dtype bf16 --flow bf16
run --stage res256_mask0 --remat attn_moe --mb 64 --accum 4 --accum-mode dispatch --accum-dtype bf16 --flow bf16

# F: the shipped recipe trains AS CONFIGURED on this chip (VERDICT round-2
# weak #4 acceptance): real train.py + tpu_v5e_1chip overlay on synthetic MDS.
echo "[sweep_r3b] >>> train_smoke_v5e res_256_pretrain ($(date +%H:%M:%S))" >&2
timeout 3000 python scripts/train_smoke_v5e.py --stage res_256_pretrain --steps 6 >&2
echo "[sweep_r3b] <<< rc=$? ($(date +%H:%M:%S))" >&2

echo "[sweep_r3b] queue done $(date +%H:%M:%S)" >&2
