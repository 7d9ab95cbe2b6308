#!/usr/bin/env bash
# Wedge watchdog: relaunch training when it exits preempted OR stops
# making progress.
#
# scripts/train_autoresume.sh covers clean preemptions (SIGTERM ->
# checkpoint -> exit 42), but a remote-runtime RPC wedge never exits:
# the process blocks forever on a dead RPC future with the device state
# unreachable (this killed the round-3 24x24 capstone and stalled the
# round-4 one; see ROADMAP.md "environment gotchas"). An exit-code loop
# cannot see that. This wrapper launches run_train, records its PID,
# and watches the experiment dir's log/metrics mtimes: if the process
# is alive but nothing has advanced for STALL_SECS, it SIGKILLs the
# recorded PID (never pattern-matched) and relaunches with
# train.resume, losing at most ckpt_every steps.
#
# Usage: train_watchdog.sh EXP_DIR STALL_SECS [run_train overrides...]
#
#   EXP_DIR     experiment dir (also passed as train.exp_dir)
#   STALL_SECS  progress timeout once training has produced output;
#               startup (restore + compile, ~10 min over the tunnel)
#               is covered by a separate LAUNCH_GRACE.
#
# On relaunch, any train.warm_start=... override is dropped once the
# exp dir has its own checkpoints (resume and warm_start are mutually
# exclusive; the warm start already happened on attempt 0).
set -u
EXP_DIR="${1:?usage: train_watchdog.sh EXP_DIR STALL_SECS [overrides...]}"
STALL_SECS="${2:?usage: train_watchdog.sh EXP_DIR STALL_SECS [overrides...]}"
shift 2
LAUNCH_GRACE="${LAUNCH_GRACE:-1500}"
POLL_SECS="${POLL_SECS:-30}"

newest_mtime() {
  local best=0 f m
  for f in "${EXP_DIR}/log.txt" "${EXP_DIR}/metrics.jsonl"; do
    [ -e "$f" ] || continue
    m=$(stat -c %Y "$f" 2>/dev/null || echo 0)
    [ "$m" -gt "$best" ] && best="$m"
  done
  echo "$best"
}

ATTEMPT=0
while :; do
  ARGS=("train.exp_dir=${EXP_DIR}")
  HAVE_CKPT=0
  if [ -d "${EXP_DIR}/checkpoints" ] && \
     find "${EXP_DIR}/checkpoints" -mindepth 1 -maxdepth 1 -type d | read -r _; then
    HAVE_CKPT=1
    ARGS+=("train.resume=${EXP_DIR}/checkpoints")
  fi
  for a in "$@"; do
    if [ "${HAVE_CKPT}" -eq 1 ] && [[ "$a" == train.warm_start=* ]]; then
      echo "[watchdog] dropping ${a} (resuming from own checkpoints)"
      continue
    fi
    ARGS+=("$a")
  done

  echo "[watchdog] attempt ${ATTEMPT}: run_train ${ARGS[*]}"
  python -m jpdvt_mt_ntnu_tpu.train.run_train "${ARGS[@]}" &
  PID=$!
  LAUNCHED=$(date +%s)

  WEDGED=0
  while kill -0 "${PID}" 2>/dev/null; do
    sleep "${POLL_SECS}"
    NOW=$(date +%s)
    LAST=$(newest_mtime)
    # Before the first REAL progress of THIS attempt, measure from launch
    # (restore + compile produce no step lines for many minutes). Two
    # cases: (a) nothing written since launch; (b) the startup config dump
    # touched log.txt but no training step has landed yet — metrics.jsonl
    # is still absent/empty (round-5 incident: the 600s stall limit killed
    # a healthy first compile because the config dump reset the clock).
    if [ "${LAST}" -lt "${LAUNCHED}" ] || [ ! -s "${EXP_DIR}/metrics.jsonl" ]; then
      AGE=$((NOW - LAUNCHED))
      LIMIT=$((LAUNCH_GRACE))
    else
      AGE=$((NOW - LAST))
      LIMIT=$((STALL_SECS))
    fi
    if [ "${AGE}" -gt "${LIMIT}" ]; then
      echo "[watchdog] no progress for ${AGE}s (> ${LIMIT}s); killing ${PID}"
      kill -KILL "${PID}" 2>/dev/null
      wait "${PID}" 2>/dev/null
      WEDGED=1
      break
    fi
  done

  if [ "${WEDGED}" -eq 1 ]; then
    ATTEMPT=$((ATTEMPT + 1))
    echo "[watchdog] relaunching after wedge (attempt ${ATTEMPT})"
    continue
  fi

  wait "${PID}"
  CODE=$?
  if [ "${CODE}" -ne 42 ]; then
    echo "[watchdog] run_train exited ${CODE}; stopping"
    exit "${CODE}"
  fi
  ATTEMPT=$((ATTEMPT + 1))
  echo "[watchdog] preempted; resuming (attempt ${ATTEMPT})"
done
