#!/usr/bin/env bash
# Round-5 ladder pipeline — the round-4 plan (scripts/ladder_r4_pipeline.sh)
# restructured to FIT one ~8h session, the failure that ate rounds 3 and 4
# (the r4 pipeline was written but never run; VERDICT r4 item 1).
#
# Change vs r4: the grid-20 rung is no longer trained 60k steps from
# scratch (~5.7h alone). The ladder is re-climbed with warm-starts —
# the mechanism PERF.md measured in rounds 3/4 (cross-grid transfer is
# what cracked 24x24's cold-start stall):
#
#   A. 3x3@192 hard_frac, 20k steps (~28 min @ 12.0 steps/s) — also the
#      trained checkpoint for the pngdir harness re-run (VERDICT item 5)
#      and the int8 serve-gate measurement (VERDICT item 6).
#   A2. pngdir re-run: 1,024 wave PNGs, greedy + hungarian journals with
#      REAL accuracy and the fixed interval logging.
#   A3. int8 gate: measured int8-vs-bf16 agreement on the trained ckpt.
#   B. 12x12@192 warm-start from A, 25k steps (~37 min @ 11.4 steps/s).
#   C. 20x20@320 warm-start from B, hard_frac=0.25 curriculum, 25k steps
#      (~2.4h @ 2.92 steps/s) — the cliff lever, finally measured.
#   D. eval 1,024 unseen (seed 11) -> logs/waves20_hard_eval (+cliff.json)
#   E. same ckpt, eval.votes=4 -> logs/waves20_hard_votes_eval (+cliff.json)
#   F. 24x24@384 warm-start from C, step budget computed from the session
#      deadline (<=15k steps, ~1.5h @ 2.74 steps/s with Pallas whole-row)
#   G. eval 1,024 unseen 576-piece puzzles -> logs/waves24_r4_eval
#   H. durable checkpoint export (tools/export_ckpt.py) + restore smoke.
#
# Hazards designed around (both measured in prior rounds):
#   - VM recycles wipe results/: every stage commits artifacts on creation,
#     training trajectories snapshot-commit every 30 min.
#   - remote-runtime RPC wedges: training runs under train_watchdog.sh.
#
# Reference anchor: the reference trains/evaluates grids 3 and 4 only
# (train_JPDVT.py, train_JPDVT_4x4.py); the ladder is upgrade territory.
set -u
cd /root/repo
mkdir -p logs bench_data
PLOG=logs/ladder_r5_pipeline.log
exec >>"$PLOG" 2>&1

# Absolute wall-clock budget: stages check this before starting long work.
DEADLINE="${PIPELINE_DEADLINE:-$(( $(date +%s) + 25200 ))}"   # default +7h
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
    sleep 1800
    [ -f "$exp/metrics.jsonl" ] || continue
    cp "$exp/metrics.jsonl" "$dst/metrics.jsonl"
    [ -f "$exp/run_config.json" ] && cp "$exp/run_config.json" "$dst/"
    gcommit "ladder r5: ${label} trajectory snapshot ($(wc -l <"$dst/metrics.jsonl") lines)" "$dst" || true
  done
}

train_stage() { # train_stage EXP_DIR LOG_DIR LABEL EPOCHS overrides...
  local exp="$1" dst="$2" label="$3" epochs="$4"; shift 4
  [ -f "$exp/DONE" ] && return 0
  say "train ${label}: ${epochs}00 steps -> ${exp}"
  snapshot_loop "$exp" "$dst" "$label" &
  local SNAP=$!
  bash scripts/train_watchdog.sh "$exp" 600 \
    train.epochs="$epochs" "${COMMON[@]}" "$@"
  local CODE=$?
  kill "$SNAP" 2>/dev/null
  if [ "$CODE" -ne 0 ]; then say "train ${label} failed ($CODE); stopping"; exit "$CODE"; fi
  touch "$exp/DONE"
  mkdir -p "$dst"
  cp "$exp/metrics.jsonl" "$dst/metrics.jsonl"
  cp "$exp/run_config.json" "$dst/" 2>/dev/null
  gcommit "ladder r5: ${label} training complete (final metrics)" "$dst"
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
train_stage "$GRID3" logs/waves3_r5_train "grid-3 hard_frac" 200 \
  model.name=JPDVT model.image_size=192 task.grid_size=3

# --------------------------------------------------------------- stage A2
# pngdir harness re-run on the TRAINED 3x3 checkpoint (VERDICT r4 item 5:
# the committed r4 journals carry chance accuracy + pre-fix rate lines).
PNGDIR=bench_data/pngdir_waves
if [ ! -f "$PNGDIR/wave_01023.png" ]; then
  say "stage A2: generating 1,024 wave PNGs"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/make_wave_pngdir.py "$PNGDIR" --n 1024 --size 192 --seed 777
fi
for ASSIGN in greedy hungarian; do
  DST=logs/pngdir_r5_${ASSIGN}
  if [ ! -f "$DST/inference_progress.csv" ] || \
     [ "$(wc -l <"$DST/inference_progress.csv")" -lt 1025 ]; then
    say "stage A2: pngdir eval ($ASSIGN)"
    python -m jpdvt_mt_ntnu_tpu.eval.run_eval \
      model.name=JPDVT model.image_size=192 task.grid_size=3 \
      data.dataset=imagenet data.data_path="$PNGDIR" \
      eval.checkpoint="$GRID3/checkpoints" eval.batch_size=128 \
      eval.assignment="$ASSIGN" eval.logs_dir="$DST" \
      || { say "pngdir $ASSIGN failed"; }
    gcommit "ladder r5: pngdir harness re-run ($ASSIGN) on trained 3x3 ckpt" "$DST" || true
  fi
done

# --------------------------------------------------------------- stage A3
# int8 serve-gate measured on a trained checkpoint (VERDICT r4 item 6).
if python -c "import jpdvt_mt_ntnu_tpu.serve.quant_gate" 2>/dev/null; then
  DST=logs/quant_gate_r5
  if [ ! -f "$DST/gate.json" ]; then
    say "stage A3: int8 quant gate on trained 3x3 ckpt"
    mkdir -p "$DST"
    python -m jpdvt_mt_ntnu_tpu.serve.quant_gate \
      model.name=JPDVT model.image_size=192 task.grid_size=3 \
      eval.checkpoint="$GRID3/checkpoints" model.quant=int8 \
      serve.quant_gate_out="$DST/gate.json" \
      || say "quant gate measured FAILURE (nonzero exit) — see $DST"
    gcommit "ladder r5: int8 serve-gate measured on trained 3x3 checkpoint" "$DST" || true
  fi
else
  say "stage A3 skipped: quant_gate module not present yet"
fi

# ---------------------------------------------------------------- stage B
train_stage "$GRID12" logs/waves12_r5_train "grid-12 warm-start" 250 \
  model.name=JPDVT model.image_size=192 task.grid_size=12 \
  train.warm_start="$GRID3/checkpoints"

# ---------------------------------------------------------------- stage C
C_EPOCHS=250
R=$(remaining)
if [ "$R" -lt 14400 ]; then C_EPOCHS=150; elif [ "$R" -lt 18000 ]; then C_EPOCHS=200; fi
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
      eval.logs_dir="$DST" || { say "eval $DST failed"; exit 1; }
  fi
  # cliff report runs idempotently whenever the journal exists but the
  # report doesn't (ADVICE r4: don't let a one-off failure skip it forever)
  if [ ! -f "$DST/cliff.json" ]; then
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/cliff_report.py \
      "$DST/inference_progress.csv" --seed 11 --grid 20 \
      --out "$DST/cliff.json" || say "cliff_report failed for $DST"
  fi
  gcommit "ladder r5: $(basename "$DST") journal + cliff report" "$DST"
}
run_eval20 logs/waves20_hard_eval
run_eval20 logs/waves20_hard_votes_eval eval.votes=4

# ---------------------------------------------------------------- stage F
# Budget-aware: 36.5s per 100 steps measured at this geometry (PERF.md
# 24x24 Pallas row); reserve ~45 min for the eval + final bench.
R=$(remaining)
F_EPOCHS=$(( (R - 2700) / 37 ))
[ "$F_EPOCHS" -gt 150 ] && F_EPOCHS=150
F_EPOCHS=$(( F_EPOCHS / 10 * 10 ))
if [ "$F_EPOCHS" -lt 50 ]; then
  say "stage F SKIPPED: only ${R}s remain (<50 epochs feasible) — honest negative"
else
  say "stage F budget: ${F_EPOCHS}00 steps (remaining ${R}s)"
  train_stage "$GRID24" logs/waves24_r4_train "grid-24 warm-start" "$F_EPOCHS" \
    model.name=JPDVT model.image_size=384 task.grid_size=24 \
    train.warm_start="$GRID20/checkpoints"

  # -------------------------------------------------------------- stage G
  if [ ! -f logs/waves24_r4_eval/inference_progress.csv ] || \
     [ "$(wc -l <logs/waves24_r4_eval/inference_progress.csv)" -lt 1025 ]; then
    say "stage G: grid-24 eval (greedy, 1024 unseen)"
    python -m jpdvt_mt_ntnu_tpu.eval.run_eval \
      model.name=JPDVT model.image_size=384 task.grid_size=24 \
      data.dataset=synthetic data.synthetic_cues=waves \
      eval.checkpoint="$GRID24/checkpoints" eval.seed=11 eval.batch_size=32 \
      eval.logs_dir=logs/waves24_r4_eval || { say "stage G failed"; exit 1; }
    gcommit "ladder r5: 24x24 capstone eval journal (1,024 unseen 576-piece puzzles)" logs/waves24_r4_eval
  fi
fi

# ---------------------------------------------------------------- stage H
# Durable-checkpoint export (VERDICT r4 item 2): EMA-only compressed
# artifact + fresh-process restore smoke, committed.
if [ -f tools/export_ckpt.py ]; then
  for RUNG in "$GRID24" "$GRID20" "$GRID3"; do
    [ -d "$RUNG/checkpoints" ] || continue
    say "stage H: exporting durable checkpoint from $RUNG"
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/export_ckpt.py \
      "$RUNG/checkpoints" --out artifacts/ && \
      gcommit "ladder r5: durable EMA checkpoint export ($(basename "$RUNG"))" artifacts/ .gitignore || true
    break
  done
fi

say "pipeline complete ($(remaining)s to spare)"
