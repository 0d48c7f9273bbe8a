#!/usr/bin/env bash
# Round-5 continuation: reclaim the chip window the main schedule leaves
# idle.  tools/round5_session.sh (as launched) computed every family's
# deadline against an undecremented WSUM — a command-substitution subshell
# ate the decrement — so each family got only w/100 of the remaining time
# and the slack from fast families accumulated into dead air between
# "schedule complete" and the endgame capture at $SCHEDULE_DEADLINE.
#
# This script waits for the main schedule to finish, then, with the
# CORRECT donate-the-slack arithmetic:
#   1. tops up the short-windowed families to their original step targets
#      (mb-hifigan 12k, NHV 12k, melgan 10k — resuming in place, no rm);
#   2. extends hifigan-light to 30k (VERDICT r04 item 3's upper target);
#   3. pours whatever is left into the flagship basis-melgan (24k -> up to
#      40k);
# re-running CPU-forced post-processing after each family so the committed
# CSVs/JSONs always describe the deepest checkpoints.
#
# Usage: SCHEDULE_DEADLINE=<unix-s> nohup bash tools/round5_continuation.sh \
#            >> runs/round5_continuation.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

: "${SCHEDULE_DEADLINE:?set SCHEDULE_DEADLINE (unix seconds)}"
export SEGMENT_STEPS="${SEGMENT_STEPS:-10000}"
STOP_FILE="${STOP_FILE:-/tmp/stop_training}"
# Leave a buffer before the endgame's stop-file drop so the last segment's
# tail checkpoint + valid pass never races the capture window.
HARD_END=$(( SCHEDULE_DEADLINE - 300 ))

CLEAN_ARGS=(
  --audio_index_path dataset/clean_audio/train
  --mel_index_path dataset/clean_mel/train
  --audio_index_valid_path dataset/clean_audio/valid
  --mel_index_valid_path dataset/clean_mel/valid
  --save_step 2500 --valid_step 1250 --batch_expand_size 1
  --stall_exit_s 1500
)
PROTOCOL_NOTE="clean-split: trained only on LJSpeech clips 1-6 (7-way \
speed-perturbed x 2 peak levels, tools/make_clean_corpus.py); LJSpeech \
clip 0 — the utterance all reference demo wavs render — and the demo wavs \
themselves were excluded from training at every speed and level"

echo "=== $(date -u +%H:%M:%S) continuation: waiting for the main schedule ==="
# Wait on the live schedule PROCESS, not the log: runs/round5_schedule.log
# already contains a "schedule complete" line from an earlier aborted
# schedule, and grepping for it here once launched a duplicate trainer
# racing the main schedule's on the same run dir.  SCHED_PID can be passed
# explicitly; otherwise detect any live round5_session.sh.
sched_alive() {
  if [ -n "${SCHED_PID:-}" ]; then
    kill -0 "$SCHED_PID" 2>/dev/null
  else
    ps -eo args | grep round5_session.sh | grep -v grep | grep -q .
  fi
}
while sched_alive; do
  [ -e "$STOP_FILE" ] && { echo "stop-file present; exiting"; exit 0; }
  sleep 60
done
echo "=== $(date -u +%H:%M:%S) main schedule finished; reclaiming ==="

remaining() { echo $(( HARD_END - $(date +%s) )); }

latest_step() {  # <run_name>
  find "runs/$1/checkpoint" -name 'checkpoint_*.pth.tar' 2>/dev/null \
    | sed -E 's/.*checkpoint_([0-9]+)\.pth\.tar/\1/' | sort -n | tail -1
}

WSUM=100
FAMILY_DEADLINE=0
family_deadline() {  # <weight>: sets FAMILY_DEADLINE, consumes weight
  local w="$1" rem
  rem=$(remaining)
  [ "$rem" -lt 0 ] && rem=0
  FAMILY_DEADLINE=$(( $(date +%s) + rem * w / WSUM ))
  WSUM=$(( WSUM - w ))
}

resume_family() {  # <run_name> <weight> <max_steps> <model> <config> <disc_start> [extra...]
  local run_name="$1" weight="$2" max_steps="$3" model_name="$4" config="$5" disc_start="$6"
  shift 6
  family_deadline "$weight"
  local deadline="$FAMILY_DEADLINE"
  local have
  have="$(latest_step "$run_name")"; have="${have:-0}"
  if [ "$have" -ge "$max_steps" ]; then
    echo "continuation: $run_name already at step $have >= $max_steps, skipping"
    return 0
  fi
  if [ -e "$STOP_FILE" ] || [ $(( deadline - $(date +%s) )) -lt 420 ]; then
    echo "continuation: skipping $run_name (stop/deadline)"; return 1
  fi
  echo "=== $(date -u +%H:%M:%S) resuming $run_name from step $have (target $max_steps, window $(( deadline - $(date +%s) ))s) ==="
  mkdir -p "runs/$run_name"
  DEADLINE_EPOCH="$deadline" TRAIN_DEADLINE_EPOCH="$deadline" \
  RUN_DIR="runs/$run_name" bash tools/train_supervised.sh "$max_steps" \
      "runs/$run_name/train.log" \
      --model_name "$model_name" --config "$config" \
      --discriminator_train_start_steps "$disc_start" \
      "${CLEAN_ARGS[@]}" "$@"
}

post_process() {  # <run_name> <model_name> <config> [phase_note]
  local run_name="$1" model_name="$2" config="$3" phase_note="${4:-}"
  local R="runs/$run_name"
  echo "=== $(date -u +%H:%M:%S) post-processing $run_name (CPU) ==="
  python3 tools/summarize_run.py "$R/logger" --tensorboard "$R/tensorboard" \
      --csv_out "docs/convergence_${run_name}.csv" || true
  python3 tools/eval_checkpoints.py --cpu --checkpoint_root "$R/checkpoint" \
      --model_name "$model_name" --config "$config" \
      --audio_index_path dataset/clean_audio/eval \
      --mel_index_path dataset/clean_mel/eval \
      --csv_out "docs/quality_${run_name}.csv" || true
  python3 tools/eval_checkpoints.py --cpu --checkpoint_root "$R/checkpoint" \
      --model_name "$model_name" --config "$config" \
      --audio_index_path dataset/clean_audio/valid \
      --mel_index_path dataset/clean_mel/valid \
      --csv_out "docs/selection_${run_name}.csv" || true
  local ckpt best_step
  best_step="$(python3 - "docs/selection_${run_name}.csv" <<'EOF'
import csv, sys
try:
    rows = list(csv.DictReader(open(sys.argv[1])))
    print(min(rows, key=lambda r: float(r["mr_stft"]))["step"] if rows else "")
except OSError:
    print("")
EOF
)"
  ckpt=""
  [ -n "$best_step" ] && ckpt="$(find "$R/checkpoint" \
      -name "checkpoint_${best_step}.pth.tar" | head -1)"
  [ -z "$ckpt" ] && ckpt="$(find "$R/checkpoint" -name 'checkpoint_*.pth.tar' \
      | sed -E 's/(.*checkpoint_)([0-9]+)(\.pth\.tar)/\2 \0/' | sort -n | tail -1 \
      | cut -d' ' -f2)"
  [ -z "$ckpt" ] && { echo "no checkpoint for $run_name"; return 0; }
  echo "selected checkpoint: $ckpt (valid-split best step: ${best_step:-n/a})"
  local demos=(/root/reference/resource/demo/ljspeech/0.wav)
  case "$model_name/$config" in
    hifigan/*light*) demos+=(/root/reference/resource/demo/0.hifigan.light.705000.wav);;
    hifigan/*large*) demos+=(/root/reference/resource/demo/0.hifigan.large.355000.wav);;
    multiband-hifigan/*light*) demos+=(/root/reference/resource/demo/0.multiband.hifigan.light.845000.remove.wav);;
    multiband-hifigan/*large*) demos+=(/root/reference/resource/demo/0.multiband.hifigan.large.945000.wav);;
    basis-melgan/*) demos+=(/root/reference/resource/demo/0.basis.melgan.light.815000.remove.wav);;
  esac
  local sel_note=""
  [ -n "$best_step" ] && sel_note="; checkpoint step $best_step selected by \
valid-split MR-STFT (held-out segments of the training clips — never the \
clip-0 eval content this comparison scores)"
  python3 tools/compare_to_reference_demo.py --cpu --checkpoint_path "$ckpt" \
      --model_name "$model_name" --config "$config" \
      --demo_wav "${demos[@]}" --save_dir docs/samples \
      --protocol_note "$PROTOCOL_NOTE${phase_note:+; $phase_note}$sel_note" \
      --output "docs/demo_comparison_${run_name}.json" || true
  # per-run snapshot of the clip-0 rendition: every family's comparison
  # writes docs/samples/0.fastvocoder_tpu.wav, so later families would
  # otherwise overwrite this one's sample
  if [ -f docs/samples/0.fastvocoder_tpu.wav ]; then
    cp docs/samples/0.fastvocoder_tpu.wav \
       "docs/samples/${run_name}_clip0.fastvocoder_tpu.wav"
    python3 - "docs/demo_comparison_${run_name}.json" "$run_name" <<'EOF'
import json, sys
p, run = sys.argv[1], sys.argv[2]
d = json.load(open(p))
r = d.get("results", {}).get("0.wav")
if r:
    r["saved_wav"] = f"docs/samples/{run}_clip0.fastvocoder_tpu.wav"
    json.dump(d, open(p, "w"), indent=2)
EOF
  fi
  echo "=== $(date -u +%H:%M:%S) $run_name post-processing done ==="
}

post_bg() {  # run post_process in the background, logging into the run dir
  local run_name="$1"
  if find "runs/$run_name/checkpoint" -name 'checkpoint_*.pth.tar' 2>/dev/null | grep -q .; then
    post_process "$@" > "runs/$run_name/post2.log" 2>&1 &
    echo "post-processing $run_name in background (pid $!)"
  else
    echo "no checkpoints for $run_name; skipping post-processing"
  fi
}

# 1. top-ups for the short-windowed families (original step targets)
resume_family mb_hifigan_light_clean 18 12000 multiband-hifigan \
    conf/multiband-hifigan/light.yaml 0
post_bg mb_hifigan_light_clean multiband-hifigan conf/multiband-hifigan/light.yaml

resume_family nhv_clean 18 12000 nhv conf/nhv/default.yaml 0
post_bg nhv_clean nhv conf/nhv/default.yaml

resume_family melgan_clean 12 10000 melgan conf/melgan/original.yaml 0
post_bg melgan_clean melgan conf/melgan/original.yaml

# 2. hifigan-light to the 30k upper target (VERDICT item 3)
resume_family hifigan_light_clean2 22 30000 hifigan conf/hifigan/light.yaml 0
post_bg hifigan_light_clean2 hifigan conf/hifigan/light.yaml

# 3. flagship depth with everything left
resume_family basis_melgan_clean2 100 40000 basis-melgan \
    conf/basis-melgan/light.yaml 2000 \
    --basis_dataset_path dataset/clean_basis
post_bg basis_melgan_clean2 basis-melgan conf/basis-melgan/light.yaml \
    "GAN phase from step 2000"

wait
echo "=== $(date -u +%H:%M:%S) continuation complete ($(remaining)s before hard end) ==="
