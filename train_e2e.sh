#!/bin/bash
# End-to-end 4-stage MicroDiT-XL training (reference train_e2e.sh equivalent):
# 256px masked pretrain -> 256px unmasked finetune -> 512px masked -> 512px unmasked,
# chaining checkpoints between stages. Each stage is one `python train.py` invocation;
# on a multi-host pod slice add --multihost and launch one process per host.
set -e

PY=${PYTHON:-python}

$PY train.py --config-name res_256_pretrain "$@"

$PY train.py --config-name res_256_finetune \
    trainer.load_path=./trained_models/MicroDiTXL_mask_75_res_256_pretrain/ "$@"

$PY train.py --config-name res_512_pretrain \
    trainer.load_path=./trained_models/MicroDiTXL_mask_0_res_256_finetune/ "$@"

$PY train.py --config-name res_512_finetune \
    trainer.load_path=./trained_models/MicroDiTXL_mask_75_res_512_pretrain/ "$@"
