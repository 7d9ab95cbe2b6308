#!/usr/bin/env bash
# Accuracy parity vs the reference checkpoint, one command — for when the
# blocked artifacts appear (BASELINE.md rows 1-2: 2850000.pt + ImageNet).
#
#   scripts/parity_when_available.sh CKPT.pt IMAGE_DIR [extra overrides...]
#
# e.g.  scripts/parity_when_available.sh \
#           /models/3x3_Full/2850000.pt /data/imagenet/test \
#           task.grid_size=3 model.image_size=192
#
# Runs the full rehearsed pipeline (tests/test_ckpt_rehearsal.py):
#   1. tools.torch_convert         torch {"ema",...} dict -> flax npz
#   2. tools.activation_compare    torch fwd vs converted flax fwd @ fp32
#   3. eval.run_eval               faithful-250 greedy eval, fp32 + highest
#                                  matmul precision, EMA weights — the
#                                  reference protocol (inference.py:37-58).
# Pass model.name=JPDVT-T model.image_size=256 task.grid_size=4 plus
# AC_ARGS="--image-size 256 --model JPDVT-T" for the 4x4 baseline row.
#
# Target: puzzle 0.6789 / patch 0.8002 on 100k ImageNet-test images
# (reference logs/3/inference_progress.csv) within 0.5%.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${1:?usage: parity_when_available.sh CKPT.pt IMAGE_DIR [overrides...]}
DATA=${2:?usage: parity_when_available.sh CKPT.pt IMAGE_DIR [overrides...]}
shift 2
OUT=${PARITY_OUT:-results/parity}
WHICH=${PARITY_WHICH:-ema}   # reference eval loads the raw 'model' entry;
                             # 'ema' is what its checkpoints score best with
mkdir -p "$OUT"
NPZ="$OUT/$(basename "${CKPT%.*}")_${WHICH}.npz"

echo "== 1/3 convert: $CKPT -> $NPZ (--which $WHICH)"
python -m jpdvt_mt_ntnu_tpu.tools.torch_convert "$CKPT" "$NPZ" --which "$WHICH"

echo "== 2/3 golden-activation compare (fp32, tol 2e-4)"
# AC_ARGS: pass --model/--image-size/--depth... when not the 3x3 flagship
python -m jpdvt_mt_ntnu_tpu.tools.activation_compare "$CKPT" "$NPZ" \
    --which "$WHICH" ${AC_ARGS:-}

echo "== 3/3 reference-protocol eval (faithful-250, fp32, highest precision)"
python -m jpdvt_mt_ntnu_tpu.eval.run_eval \
    data.data_path="$DATA" eval.checkpoint="$NPZ" \
    model.compute_dtype=float32 model.matmul_precision=highest \
    diffusion.sampling_steps=250 diffusion.sampler_mode=faithful \
    eval.assignment=greedy eval.logs_dir="$OUT/logs" \
    "$@"

echo "parity run complete — journal in $OUT/logs; compare against BASELINE.md"
