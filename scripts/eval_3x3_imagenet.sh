#!/usr/bin/env bash
# Batched resumable evaluation over an image tree — reference inference.py /
# inference_ddp.py. Multi-host: run on every host; files shard automatically.
set -euo pipefail
DATA=${1:?usage: eval_3x3_imagenet.sh /path/to/imagenet/test CKPT}
CKPT=${2:?checkpoint dir or converted .npz}

python -m jpdvt_mt_ntnu_tpu.eval.run_eval \
    "data.data_path=${DATA}" "eval.checkpoint=${CKPT}" \
    model.name=JPDVT model.image_size=192 task.grid_size=3 \
    diffusion.sampling_steps=250 eval.batch_size=64 \
    "${@:3}"
