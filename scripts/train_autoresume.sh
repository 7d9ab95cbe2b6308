#!/usr/bin/env bash
# Elastic training wrapper: relaunch after clean preemptions.
#
# run_train installs SIGTERM/SIGINT handlers that checkpoint the full state
# and exit with code 42 (run_train.PREEMPTED_EXIT). This loop relaunches
# with train.resume pointed at the same experiment dir until training
# finishes (exit 0) or fails for real (any other code).
#
# Usage: scripts/train_autoresume.sh EXP_DIR [run_train overrides...]
set -u
EXP_DIR="${1:?usage: train_autoresume.sh EXP_DIR [overrides...]}"
shift

ATTEMPT=0
while :; do
  ARGS=("train.exp_dir=${EXP_DIR}" "$@")
  if [ -d "${EXP_DIR}/checkpoints" ] && \
     find "${EXP_DIR}/checkpoints" -mindepth 1 -maxdepth 1 | read -r _; then
    ARGS+=("train.resume=${EXP_DIR}/checkpoints")
  fi
  echo "[autoresume] attempt ${ATTEMPT}: run_train ${ARGS[*]}"
  python -m jpdvt_mt_ntnu_tpu.train.run_train "${ARGS[@]}"
  CODE=$?
  if [ "${CODE}" -ne 42 ]; then
    echo "[autoresume] run_train exited ${CODE}; stopping"
    exit "${CODE}"
  fi
  ATTEMPT=$((ATTEMPT + 1))
  echo "[autoresume] preempted; resuming (attempt ${ATTEMPT})"
done
