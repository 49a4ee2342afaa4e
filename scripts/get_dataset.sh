#!/bin/bash
# Download -> convert -> precompute one dataset (parameterized equivalent of the
# reference's six per-dataset scripts in datasets/scripts/). The per-dataset
# download/convert live in micro_diffusion_tpu/datasets/prepare/{jdb,diffdb,cc12m,
# sa1b,textcaps,coco}.py, mirroring the reference layouts exactly.
#
# Usage:
#   scripts/get_dataset.sh <jdb|diffdb|cc12m|sa1b|textcaps|coco> <datadir> [small]
#
#   small: ~1% subset for initial experimentation (reference README.md:26)
#
# Precompute requires local HF snapshots of the VAE + text encoder + tokenizer
# (set VAE_WEIGHTS_DIR / TEXT_ENCODER_WEIGHTS_DIR / TOKENIZER_DIR).
# sa1b additionally needs SA1B_LINKS_FILE (the rotating tar-URL file saved from
# https://ai.meta.com/datasets/segment-anything-downloads/).
set -e

DATASET=$1
DATADIR=$2
SUBSET=${3:-full}
PKG=micro_diffusion_tpu.datasets.prepare

case "$DATASET" in
  jdb)
    IDS=""
    if [ "$SUBSET" = "small" ]; then IDS="--valid_ids 0 1"; fi
    python -m $PKG.jdb download --datadir "$DATADIR/raw" $IDS
    python -m $PKG.jdb convert \
        --images_dir "$DATADIR/raw/raw/train/imgs" \
        --captions_jsonl "$DATADIR/raw/raw/train/train_anno_realease_repath.jsonl" \
        --local_mds_dir "$DATADIR/mds"
    ;;
  diffdb)
    IDS=""
    if [ "$SUBSET" = "small" ]; then IDS="--valid_ids $(seq 1 140 | tr '\n' ' ')"; fi
    python -m $PKG.diffdb download --datadir "$DATADIR/raw" $IDS
    python -m $PKG.diffdb convert \
        --images_dir "$DATADIR/raw/raw" --local_mds_dir "$DATADIR/mds" \
        --safety_threshold 0.2
    ;;
  cc12m)
    IDS=""
    if [ "$SUBSET" = "small" ]; then IDS="--valid_ids $(seq 0 21 | tr '\n' ' ')"; fi
    python -m $PKG.cc12m download --datadir "$DATADIR/wds" $IDS
    python -m $PKG.cc12m convert \
        --wds_dir "$DATADIR/wds" --local_mds_dir "$DATADIR/mds"
    ;;
  sa1b)
    FRACTION=1.0
    if [ "$SUBSET" = "small" ]; then FRACTION=0.01; fi
    python -m $PKG.sa1b download --datadir "$DATADIR/raw" \
        --links_file "${SA1B_LINKS_FILE:?set SA1B_LINKS_FILE}" \
        --data_fraction "$FRACTION" --skip_existing
    python -m $PKG.sa1b convert \
        --images_dir "$DATADIR/raw/raw" --captions_dir "$DATADIR/raw/captions" \
        --local_mds_dir "$DATADIR/mds"
    ;;
  textcaps)
    python -m $PKG.textcaps --local_mds_dir "$DATADIR/mds"
    ;;
  coco)
    python -m $PKG.coco download --datadir "$DATADIR/raw"
    python -m $PKG.coco convert --datadir "$DATADIR/raw" \
        --local_mds_dir "$DATADIR/mds"
    ;;
  *)
    echo "unknown dataset: $DATASET" >&2; exit 1
    ;;
esac

python -m $PKG.precompute \
    --dataset "$DATASET" \
    --datadir "$DATADIR/mds" \
    --savedir "$DATADIR/mds_latents_sdxl1_dfnclipH14" \
    --vae_weights_dir "${VAE_WEIGHTS_DIR:?set VAE_WEIGHTS_DIR}" \
    --text_encoder_weights_dir "${TEXT_ENCODER_WEIGHTS_DIR:?set TEXT_ENCODER_WEIGHTS_DIR}" \
    --tokenizer_dir "${TOKENIZER_DIR:?set TOKENIZER_DIR}"

# cc12m additionally builds a minside>=512 variant for the 512px stages
# (reference scripts/get_cc12m_dataset.sh:27-31)
if [ "$DATASET" = "cc12m" ]; then
    python -m $PKG.cc12m convert \
        --wds_dir "$DATADIR/wds" --min_image_size 512 \
        --local_mds_dir "$DATADIR/mds_minres512"
    python -m $PKG.precompute \
        --dataset cc12m \
        --datadir "$DATADIR/mds_minres512" \
        --savedir "$DATADIR/mds_minres512_latents_sdxl1_dfnclipH14" \
        --vae_weights_dir "$VAE_WEIGHTS_DIR" \
        --text_encoder_weights_dir "$TEXT_ENCODER_WEIGHTS_DIR" \
        --tokenizer_dir "$TOKENIZER_DIR"
fi
