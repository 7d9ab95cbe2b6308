#!/usr/bin/env bash
# 3x3 ImageNet training recipe — the torchrun command of the reference
# (commands-hamza.sh:2, train_JPDVT.py defaults), TPU-native. On a multi-host
# pod, run this same command on every host; jax.distributed handles the rest.
set -euo pipefail
DATA=${1:?usage: train_3x3_imagenet.sh /path/to/imagenet/train}

python -m jpdvt_mt_ntnu_tpu.train.run_train \
    data.dataset=imagenet "data.data_path=${DATA}" \
    model.name=JPDVT model.image_size=192 \
    task.grid_size=3 task.crop=true \
    data.global_batch_size=96 train.epochs=500 \
    train.lr=1e-4 train.ckpt_every=50000 \
    "$@"
