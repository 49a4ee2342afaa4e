#!/usr/bin/env bash
# Round-4 probe queue E: traces for the 256px stages + stage 3.
# Stage 1 carries 25% of schedule time (250k steps at 231.7 img/s) and has
# never been profiled post-lane-flash; stage 3 carries 16%. Attribution
# decides whether any pre-final-bench kernel push is worth it.
set -uo pipefail
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) tune $*" >&2
  timeout 2400 python scripts/tune.py "$@" 2>&1 | tail -6
  echo "=== exit $? ===" >&2
}

run --stage res256_mask75 --remat attn_moe --mb 128 --nu bf16 --moe onehot \
    --profile
run --stage res512_mask75 --remat attn_moe --mb 32 --nu bf16 --moe onehot \
    --profile
