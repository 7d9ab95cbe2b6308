#!/usr/bin/env bash
# Round-4 ladder pipeline — unattended re-attack of the 20x20 cliff and
# the 24x24 capstone, designed around two measured hazards:
#   (1) VM recycles wipe checkpoints (ROADMAP.md): every stage commits its
#       artifacts (eval journals, metrics snapshots) as soon as they exist.
#   (2) remote-runtime RPC wedges never exit (scripts/train_watchdog.sh):
#       both training stages run under the wedge watchdog.
#
# Stages:
#   A. grid-20 from scratch, 60k steps, data.synthetic_hard_frac=0.25 —
#      the curriculum lever the round-4 cliff analysis points at
#      (PERF.md "20x20 plateau"; hard region = 8.8% of draws, 30% fail).
#   B. eval 1,024 unseen (natural distribution, seed 11) -> logs/waves20_hard_eval
#   C. same checkpoint, eval.votes=4 -> logs/waves20_hard_votes_eval
#      (isolates test-time voting on top of the curriculum fix)
#   D. cliff_report on both journals (in/out-region conditional failure)
#   E. grid-24 warm-start from the stage-A checkpoint, 25k steps
#   F. eval 1,024 unseen 576-piece puzzles -> logs/waves24_r4_eval
#
# Reference anchor: the reference trains/evaluates grids 3 and 4 only
# (train_JPDVT.py, train_JPDVT_4x4.py); the ladder is upgrade territory.
set -u
cd /root/repo
mkdir -p logs
PLOG=logs/ladder_r4_pipeline.log
exec >>"$PLOG" 2>&1

say() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

gcommit() { # gcommit "msg" path...
  local msg="$1"; shift
  local i
  for i in 1 2 3; do
    # pathspec commit: never sweep in concurrently-staged unrelated files
    git add -- "$@" && git commit -q -m "$msg" -- "$@" && { say "committed: $msg"; return 0; }
    sleep 15
  done
  say "commit FAILED: $msg"
  return 1
}

# Periodically snapshot an exp dir's metrics into a committed logs dir so
# a VM recycle cannot erase the training trajectory.
snapshot_loop() { # snapshot_loop EXP_DIR LOG_DIR LABEL
  local exp="$1" dst="$2" label="$3"
  mkdir -p "$dst"
  while :; do
    sleep 1800
    [ -f "$exp/metrics.jsonl" ] || continue
    cp "$exp/metrics.jsonl" "$dst/metrics.jsonl"
    [ -f "$exp/run_config.json" ] && cp "$exp/run_config.json" "$dst/"
    gcommit "ladder r4: ${label} trajectory snapshot ($(wc -l <"$dst/metrics.jsonl") lines)" "$dst" || true
  done
}

GRID20=results/waves20_hard
GRID24=results/waves24_r4

COMMON=(data.dataset=synthetic data.synthetic_cues=waves
        data.device_stream=true data.synthetic_n=9600
        data.global_batch_size=96 train.t_bias=2.0 train.ema_warmup=true
        train.ckpt_every=5000 train.val_every=2500 train.log_every=250)

# ---------------------------------------------------------------- stage A
if [ ! -f "$GRID20/DONE" ]; then
  say "stage A: grid-20 hard_frac=0.25 training (60k steps)"
  snapshot_loop "$GRID20" logs/waves20_hard_train "grid-20 hard_frac" &
  SNAP=$!
  bash scripts/train_watchdog.sh "$GRID20" 600 \
    model.name=JPDVT model.image_size=320 task.grid_size=20 \
    data.synthetic_hard_frac=0.25 train.epochs=600 "${COMMON[@]}"
  CODE=$?
  kill "$SNAP" 2>/dev/null
  if [ "$CODE" -ne 0 ]; then say "stage A failed ($CODE); stopping"; exit "$CODE"; fi
  touch "$GRID20/DONE"
  cp "$GRID20/metrics.jsonl" logs/waves20_hard_train/metrics.jsonl
  cp "$GRID20/run_config.json" logs/waves20_hard_train/ 2>/dev/null
  gcommit "ladder r4: grid-20 hard_frac training complete (final metrics)" logs/waves20_hard_train
fi

# ---------------------------------------------------------------- stage B
EVAL20=(model.name=JPDVT model.image_size=320 task.grid_size=20
        data.dataset=synthetic data.synthetic_cues=waves
        eval.checkpoint="$GRID20/checkpoints" eval.seed=11 eval.batch_size=64)
if [ ! -f logs/waves20_hard_eval/inference_progress.csv ] || \
   [ "$(wc -l <logs/waves20_hard_eval/inference_progress.csv)" -lt 1025 ]; then
  say "stage B: grid-20 eval (greedy, 1024 unseen)"
  python -m jpdvt_mt_ntnu_tpu.eval.run_eval "${EVAL20[@]}" \
    eval.logs_dir=logs/waves20_hard_eval || { say "stage B failed"; exit 1; }
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/cliff_report.py \
    logs/waves20_hard_eval/inference_progress.csv --seed 11 \
    --out logs/waves20_hard_eval/cliff.json || true
  gcommit "ladder r4: grid-20 hard_frac eval journal + cliff report" logs/waves20_hard_eval
fi

# ---------------------------------------------------------------- stage C
if [ ! -f logs/waves20_hard_votes_eval/inference_progress.csv ] || \
   [ "$(wc -l <logs/waves20_hard_votes_eval/inference_progress.csv)" -lt 1025 ]; then
  say "stage C: grid-20 eval with votes=4"
  python -m jpdvt_mt_ntnu_tpu.eval.run_eval "${EVAL20[@]}" eval.votes=4 \
    eval.logs_dir=logs/waves20_hard_votes_eval || { say "stage C failed"; exit 1; }
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/cliff_report.py \
    logs/waves20_hard_votes_eval/inference_progress.csv --seed 11 \
    --out logs/waves20_hard_votes_eval/cliff.json || true
  gcommit "ladder r4: grid-20 votes=4 eval journal + cliff report" logs/waves20_hard_votes_eval
fi

# ---------------------------------------------------------------- stage E
if [ ! -f "$GRID24/DONE" ]; then
  say "stage E: grid-24 warm-start training (25k steps)"
  snapshot_loop "$GRID24" logs/waves24_r4_train "grid-24 warm-start" &
  SNAP=$!
  bash scripts/train_watchdog.sh "$GRID24" 600 \
    model.name=JPDVT model.image_size=384 task.grid_size=24 \
    data.synthetic_hard_frac=0.25 train.epochs=250 \
    train.warm_start="$GRID20/checkpoints" "${COMMON[@]}"
  CODE=$?
  kill "$SNAP" 2>/dev/null
  if [ "$CODE" -ne 0 ]; then say "stage E failed ($CODE); stopping"; exit "$CODE"; fi
  touch "$GRID24/DONE"
  cp "$GRID24/metrics.jsonl" logs/waves24_r4_train/metrics.jsonl
  cp "$GRID24/run_config.json" logs/waves24_r4_train/ 2>/dev/null
  gcommit "ladder r4: grid-24 warm-start training complete (final metrics)" logs/waves24_r4_train
fi

# ---------------------------------------------------------------- stage F
if [ ! -f logs/waves24_r4_eval/inference_progress.csv ] || \
   [ "$(wc -l <logs/waves24_r4_eval/inference_progress.csv)" -lt 1025 ]; then
  say "stage F: grid-24 eval (greedy, 1024 unseen)"
  python -m jpdvt_mt_ntnu_tpu.eval.run_eval \
    model.name=JPDVT model.image_size=384 task.grid_size=24 \
    data.dataset=synthetic data.synthetic_cues=waves \
    eval.checkpoint="$GRID24/checkpoints" eval.seed=11 eval.batch_size=32 \
    eval.logs_dir=logs/waves24_r4_eval || { say "stage F failed"; exit 1; }
  gcommit "ladder r4: 24x24 capstone eval journal (1,024 unseen 576-piece puzzles)" logs/waves24_r4_eval
fi

say "pipeline complete"
