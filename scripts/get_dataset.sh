#!/bin/bash
# Download -> convert -> precompute one dataset (parameterized equivalent of the
# reference's six per-dataset scripts in datasets/scripts/).
#
# Usage:
#   scripts/get_dataset.sh <jdb|diffdb|cc12m|sa1b|textcaps|coco> <datadir> [small]
#
#   small: ~1% subset for initial experimentation (reference README.md:26)
#
# Precompute requires local HF snapshots of the VAE + text encoder + tokenizer
# (set VAE_WEIGHTS_DIR / TEXT_ENCODER_WEIGHTS_DIR / TOKENIZER_DIR).
set -e

DATASET=$1
DATADIR=$2
SUBSET=${3:-full}

FRACTION=1.0
if [ "$SUBSET" = "small" ]; then FRACTION=0.01; fi

python -m micro_diffusion_tpu.datasets.prepare.download \
    --dataset "$DATASET" --datadir "$DATADIR/raw" --data_fraction "$FRACTION"

python -m micro_diffusion_tpu.datasets.prepare.convert \
    --dataset "$DATASET" \
    --images_dir "$DATADIR/raw/images" \
    --captions_file "$DATADIR/raw/captions.json" \
    --local_mds_dir "$DATADIR/mds"

python -m micro_diffusion_tpu.datasets.prepare.precompute \
    --dataset "$DATASET" \
    --datadir "$DATADIR/mds" \
    --savedir "$DATADIR/mds_latents_sdxl1_dfnclipH14" \
    --vae_weights_dir "${VAE_WEIGHTS_DIR:?set VAE_WEIGHTS_DIR}" \
    --text_encoder_weights_dir "${TEXT_ENCODER_WEIGHTS_DIR:?set TEXT_ENCODER_WEIGHTS_DIR}" \
    --tokenizer_dir "${TOKENIZER_DIR:?set TOKENIZER_DIR}"

# cc12m additionally builds a minside>=512 variant for the 512px stages
if [ "$DATASET" = "cc12m" ]; then
    python -m micro_diffusion_tpu.datasets.prepare.convert \
        --dataset cc12m --min_side 512 \
        --images_dir "$DATADIR/raw/images" \
        --captions_file "$DATADIR/raw/captions.json" \
        --local_mds_dir "$DATADIR/mds_minres512"
    python -m micro_diffusion_tpu.datasets.prepare.precompute \
        --dataset cc12m \
        --datadir "$DATADIR/mds_minres512" \
        --savedir "$DATADIR/mds_minres512_latents_sdxl1_dfnclipH14" \
        --vae_weights_dir "$VAE_WEIGHTS_DIR" \
        --text_encoder_weights_dir "$TEXT_ENCODER_WEIGHTS_DIR" \
        --tokenizer_dir "$TOKENIZER_DIR"
fi
