#!/usr/bin/env bash
# Supervised long-run training: keep a run alive across host-process deaths.
#
# Long runs on shared/remote-TPU hosts can lose the training process to
# host-side failures (e.g. the axon host-RAM leak documented in
# tools/summarize_run.py forces multi-hour runs into segments).  The trainer
# already auto-resumes from a checkpoint root (bin/train.py:202-229 picks the
# newest checkpoint_<step>.pth.tar recursively and restores the step counter
# from it); this wrapper is the missing supervisor: rerun until the target
# step count is reached, resuming from the newest checkpoint each segment.
# Loss/tensorboard logs land in per-segment stamped dirs which
# tools/summarize_run.py merges into one continuous curve.
#
# Usage:
#   RUN_DIR=runs/<name> tools/train_supervised.sh <max_steps> <log_file> \
#       <bin.train args...>
# (do NOT pass --max_steps/--checkpoint_path/--run_dir in the args; the
# supervisor owns them.  RUN_DIR makes the run self-contained — checkpoints,
# loss logs and tensorboard land under $RUN_DIR/ via bin.train --run_dir,
# and the supervisor resumes from $RUN_DIR/checkpoint.  Without RUN_DIR the
# trainer writes to the hp-default cwd-relative paths and the supervisor
# watches ./checkpoint (CKPT_ROOT overrides just the watch root).
# Touch $STOP_FILE (default /tmp/stop_training) to stop between segments.
# SEGMENT_STEPS bounds each segment's length so the per-step host-RAM leak
# stays within budget — each segment exits gracefully with a final
# checkpoint instead of riding the leak into the OOM killer.
# DEADLINE_EPOCH (unix seconds, optional) refuses to START a segment after
# the deadline: set it below the round-end benchmark-capture window so no
# training run is ever live on the chip when the driver measures
# (VERDICT r03 weak 1: a live run poisoned the round-3 BENCH artifact).
# Pair it with SEGMENT_STEPS sized to ~15-20 min so the last segment also
# ENDS before the capture window.)
set -u

MAX_STEPS="$1"; shift
LOG="$1"; shift
RUN_DIR="${RUN_DIR:-}"
run_dir_args=()
if [ -n "$RUN_DIR" ]; then
  CKPT_ROOT="${CKPT_ROOT:-$RUN_DIR/checkpoint}"
  run_dir_args=(--run_dir "$RUN_DIR")
fi
CKPT_ROOT="${CKPT_ROOT:-checkpoint}"
STOP_FILE="${STOP_FILE:-/tmp/stop_training}"
SEGMENT_STEPS="${SEGMENT_STEPS:-$MAX_STEPS}"

latest_step() {
  find "$CKPT_ROOT" -name 'checkpoint_*.pth.tar' 2>/dev/null \
    | sed -E 's/.*checkpoint_([0-9]+)\.pth\.tar/\1/' | sort -n | tail -1
}

while true; do
  step="$(latest_step)"; step="${step:-0}"
  if [ "$step" -ge "$MAX_STEPS" ]; then
    echo "supervisor: reached step $step >= $MAX_STEPS, done" >> "$LOG"
    break
  fi
  if [ -e "$STOP_FILE" ]; then
    echo "supervisor: $STOP_FILE present, stopping at step $step" >> "$LOG"
    break
  fi
  if [ -n "${DEADLINE_EPOCH:-}" ] && [ "$(date +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "supervisor: wall-clock deadline reached, stopping at step $step" >> "$LOG"
    break
  fi
  resume=()
  [ "$step" -gt 0 ] && resume=(--checkpoint_path "$CKPT_ROOT")
  seg_target=$((step + SEGMENT_STEPS))
  [ "$seg_target" -gt "$MAX_STEPS" ] && seg_target="$MAX_STEPS"
  echo "supervisor: starting segment from step $step (target $seg_target)" >> "$LOG"
  python3 -m fastvocoder_tpu.bin.train "$@" --max_steps "$seg_target" \
    "${run_dir_args[@]:+${run_dir_args[@]}}" \
    "${resume[@]:+${resume[@]}}" >> "$LOG" 2>&1
  rc=$?
  step2="$(latest_step)"; step2="${step2:-0}"
  if [ "$rc" -eq 0 ] && [ "$step2" -ge "$MAX_STEPS" ]; then
    echo "supervisor: segment finished at step $step2, done" >> "$LOG"
    break
  fi
  if [ "$step2" -le "$step" ]; then
    fails=$((${fails:-0} + 1))
    if [ "$fails" -ge 3 ]; then
      # three consecutive segments with no checkpoint progress: the run is
      # wedged (bad args, broken data, persistent crash) — restarting
      # forever would burn the host without training anything
      echo "supervisor: no progress after $fails segments (stuck at step" \
           "$step2, last rc=$rc), giving up" >> "$LOG"
      exit 1
    fi
  else
    fails=0
  fi
  echo "supervisor: segment exited rc=$rc at step $step2, restarting" >> "$LOG"
  sleep 5
done
