#!/usr/bin/env bash
# Round-4 probe queue H: cross-attention backend split. The round-4 traces
# attribute 48 ms/step (stage 1) / 16.4 (stage 3) / 9.2 (stage 4) to the
# lane-flash cross-attn kernels - whose shape (kv=77, Tq-block programs per
# image) runs ~10^2 tiny grid programs off the MXU roofline. Probe: keep
# lane flash for self-attn, dispatch cross-attn to the fused XLA path.
# Compare to round-3/4 K=1 bares: s1 231.4, s2 102.3, s3 66.6, s4 24.0.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) tune $*" >&2
  timeout 2400 python scripts/tune.py "$@" 2>&1 | tail -6
  echo "=== exit $? ===" >&2
}

run --stage res256_mask75 --remat attn_moe --mb 128 --nu bf16 --moe onehot \
    --xattn xla --steps 10
run --stage res512_mask0 --remat attn_moe --mb 8 --nu bf16 --moe onehot \
    --xattn xla --steps 10
run --stage res512_mask75 --remat attn_moe --mb 32 --nu bf16 --moe onehot \
    --xattn xla --steps 10
run --stage res256_mask0 --remat attn_moe --mb 64 --nu bf16 --moe onehot \
    --xattn xla --steps 10
