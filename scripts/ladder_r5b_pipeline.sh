#!/usr/bin/env bash
# Round-5 FINAL-session ladder re-climb.
#
# The r5a session (scripts/ladder_r5_pipeline.sh) completed stages A-B
# (grid-3 + grid-12 trained to 1.0 / 0.99 val — trajectories committed in
# logs/waves3_r5_train, logs/waves12_r5_train) plus the pngdir re-run and
# the int8 gate measurements, but the VM recycled before stage C and the
# checkpoints under results/ were wiped (the same failure that ate the
# rounds-3/4 capstones, ROADMAP.md). This script re-climbs with TRIMMED
# budgets (the committed trajectories show where each rung plateaus:
# grid-3 at ~10k steps, grid-12 at ~12-15k warm steps) and — the fix —
# EXPORTS + COMMITS a durable checkpoint artifact right after each rung
# (tools/export_ckpt.py), so no future recycle can erase the ladder.
#
#   A. 3x3@192 hard_frac, 10k steps      (~20 min, plateaued 1.0 @7.5k r5a)
#   B. 12x12@192 warm-start, 12.5k steps (~30 min, 0.98 EMA @12.5k r5a)
#   B2. durable export+commit of grid-12 (insurance vs mid-session recycle)
#   C. 20x20@320 warm-start, hard_frac=0.25, budget-aware steps
#      (VERDICT r4 items 1+4: the cliff lever, finally measured)
#   D. eval 1,024 unseen (seed 11) -> logs/waves20_hard_eval (+cliff.json)
#   D2. durable export+commit of grid-20
#   E. same ckpt, eval.votes=4 -> logs/waves20_hard_votes_eval (+cliff.json)
#   F/G. 24x24 warm-start + eval ONLY if time remains (it usually won't in
#      a 4h session; the honest negative is logged).
#
# Reference anchor: the reference trains/evaluates grids 3 and 4 only
# (image_model/train_JPDVT.py, train_JPDVT_4x4.py); the ladder is upgrade
# territory.
set -u
cd /root/repo
mkdir -p logs
PLOG=logs/ladder_r5b_pipeline.log
exec >>"$PLOG" 2>&1

DEADLINE="${PIPELINE_DEADLINE:-$(( $(date +%s) + 11400 ))}"
remaining() { echo $(( DEADLINE - $(date +%s) )); }

say() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

gcommit() { # gcommit "msg" path...
  local msg="$1"; shift
  local i
  for i in 1 2 3; do
    git add -- "$@" && git commit -q -m "$msg" -- "$@" && { say "committed: $msg"; return 0; }
    sleep 15
  done
  say "commit FAILED: $msg"
  return 1
}

snapshot_loop() { # snapshot_loop EXP_DIR LOG_DIR LABEL
  local exp="$1" dst="$2" label="$3"
  mkdir -p "$dst"
  while :; do
    sleep 1500
    [ -f "$exp/metrics.jsonl" ] || continue
    cp "$exp/metrics.jsonl" "$dst/metrics.jsonl"
    [ -f "$exp/run_config.json" ] && cp "$exp/run_config.json" "$dst/"
    gcommit "ladder r5b: ${label} trajectory snapshot ($(wc -l <"$dst/metrics.jsonl") lines)" "$dst" || true
  done
}

train_stage() { # train_stage EXP_DIR LOG_DIR LABEL EPOCHS overrides...
  local exp="$1" dst="$2" label="$3" epochs="$4"; shift 4
  [ -f "$exp/DONE" ] && return 0
  say "train ${label}: ${epochs}00 steps -> ${exp}"
  local SNAP=""
  if [ -n "$dst" ]; then
    snapshot_loop "$exp" "$dst" "$label" &
    SNAP=$!
  fi
  bash scripts/train_watchdog.sh "$exp" 600 \
    train.epochs="$epochs" "${COMMON[@]}" "$@"
  local CODE=$?
  [ -n "$SNAP" ] && kill "$SNAP" 2>/dev/null
  if [ "$CODE" -ne 0 ]; then say "train ${label} failed ($CODE); stopping"; exit "$CODE"; fi
  touch "$exp/DONE"
  if [ -n "$dst" ]; then
    mkdir -p "$dst"
    cp "$exp/metrics.jsonl" "$dst/metrics.jsonl"
    cp "$exp/run_config.json" "$dst/" 2>/dev/null
    gcommit "ladder r5b: ${label} training complete (final metrics)" "$dst"
  fi
}

export_stage() { # export_stage RUNG_DIR LABEL
  local rung="$1" label="$2"
  [ -d "$rung/checkpoints" ] || { say "export ${label}: no checkpoints"; return 1; }
  say "export ${label}: durable artifact from $rung"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/export_ckpt.py \
    "$rung/checkpoints" --out artifacts/ \
    && gcommit "ladder r5b: durable EMA checkpoint export (${label}) + restore smoke" artifacts/ \
    || say "export ${label} FAILED"
}

GRID3=results/waves3_r5
GRID12=results/waves12_r5
GRID20=results/waves20_hard
GRID24=results/waves24_r4

COMMON=(data.dataset=synthetic data.synthetic_cues=waves
        data.device_stream=true data.synthetic_n=9600
        data.synthetic_hard_frac=0.25
        data.global_batch_size=96 train.t_bias=2.0 train.ema_warmup=true
        train.ckpt_every=5000 train.val_every=2500 train.log_every=250)

# ---------------------------------------------------------------- stage A
# Trajectory at identical config already committed (logs/waves3_r5_train);
# no snapshot dir — this is a re-train for the checkpoint only.
train_stage "$GRID3" "" "grid-3 re-climb" 100 \
  model.name=JPDVT model.image_size=192 task.grid_size=3

# ---------------------------------------------------------------- stage B
train_stage "$GRID12" "" "grid-12 re-climb" 125 \
  model.name=JPDVT model.image_size=192 task.grid_size=12 \
  train.warm_start="$GRID3/checkpoints"

# --------------------------------------------------------------- stage B2
export_stage "$GRID12" "grid-12"

# ---------------------------------------------------------------- stage C
# 34.2 s per 100 steps measured at 20x20@320 (PERF.md); reserve time for
# D (eval ~12 min) + D2 (export ~8 min) + E (votes ~30 min) + slack.
R=$(remaining)
C_EPOCHS=$(( (R - 4300) / 35 ))
[ "$C_EPOCHS" -gt 250 ] && C_EPOCHS=250
[ "$C_EPOCHS" -lt 50 ] && C_EPOCHS=50
say "stage C budget: ${C_EPOCHS}00 steps (remaining ${R}s)"
train_stage "$GRID20" logs/waves20_hard_train "grid-20 hard_frac" "$C_EPOCHS" \
  model.name=JPDVT model.image_size=320 task.grid_size=20 \
  train.warm_start="$GRID12/checkpoints"

# -------------------------------------------------------------- stage D/E
EVAL20=(model.name=JPDVT model.image_size=320 task.grid_size=20
        data.dataset=synthetic data.synthetic_cues=waves
        eval.checkpoint="$GRID20/checkpoints" eval.seed=11 eval.batch_size=64)
run_eval20() { # run_eval20 DST extra-overrides...
  local DST="$1"; shift
  if [ ! -f "$DST/inference_progress.csv" ] || \
     [ "$(wc -l <"$DST/inference_progress.csv")" -lt 1025 ]; then
    say "eval -> $DST"
    python -m jpdvt_mt_ntnu_tpu.eval.run_eval "${EVAL20[@]}" "$@" \
      eval.logs_dir="$DST" || { say "eval $DST failed"; return 1; }
  fi
  if [ ! -f "$DST/cliff.json" ]; then
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/cliff_report.py \
      "$DST/inference_progress.csv" --seed 11 --grid 20 \
      --out "$DST/cliff.json" || say "cliff_report failed for $DST"
  fi
  gcommit "ladder r5b: $(basename "$DST") journal + cliff report" "$DST"
}
run_eval20 logs/waves20_hard_eval

# --------------------------------------------------------------- stage D2
export_stage "$GRID20" "grid-20-hard"

# ---------------------------------------------------------------- stage E
R=$(remaining)
if [ "$R" -gt 2000 ]; then
  run_eval20 logs/waves20_hard_votes_eval eval.votes=4
else
  say "stage E SKIPPED: only ${R}s remain for a ~25 min votes eval"
fi

# -------------------------------------------------------------- stage F/G
R=$(remaining)
if [ "$R" -gt 4500 ]; then
  F_EPOCHS=$(( (R - 2700) / 37 ))
  [ "$F_EPOCHS" -gt 150 ] && F_EPOCHS=150
  F_EPOCHS=$(( F_EPOCHS / 10 * 10 ))
  say "stage F budget: ${F_EPOCHS}00 steps (remaining ${R}s)"
  train_stage "$GRID24" logs/waves24_r4_train "grid-24 warm-start" "$F_EPOCHS" \
    model.name=JPDVT model.image_size=384 task.grid_size=24 \
    train.warm_start="$GRID20/checkpoints"
  if [ ! -f logs/waves24_r4_eval/inference_progress.csv ] || \
     [ "$(wc -l <logs/waves24_r4_eval/inference_progress.csv)" -lt 1025 ]; then
    say "stage G: grid-24 eval (greedy, 1024 unseen)"
    python -m jpdvt_mt_ntnu_tpu.eval.run_eval \
      model.name=JPDVT model.image_size=384 task.grid_size=24 \
      data.dataset=synthetic data.synthetic_cues=waves \
      eval.checkpoint="$GRID24/checkpoints" eval.seed=11 eval.batch_size=32 \
      eval.logs_dir=logs/waves24_r4_eval || say "stage G failed"
    gcommit "ladder r5b: 24x24 capstone eval journal" logs/waves24_r4_eval
  fi
  export_stage "$GRID24" "grid-24"
else
  say "stage F/G SKIPPED: ${R}s remain (<4500s) — honest negative, see PERF.md"
fi

say "pipeline complete ($(remaining)s to spare)"
