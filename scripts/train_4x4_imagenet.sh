#!/usr/bin/env bash
# 4x4 ImageNet training — reference train_JPDVT_4x4.py (JPDVT-T @ 256).
set -euo pipefail
DATA=${1:?usage: train_4x4_imagenet.sh /path/to/imagenet/train}

python -m jpdvt_mt_ntnu_tpu.train.run_train \
    data.dataset=imagenet "data.data_path=${DATA}" \
    model.name=JPDVT-T model.image_size=256 \
    task.grid_size=4 \
    data.global_batch_size=96 train.epochs=500 \
    "$@"
