#!/usr/bin/env bash
# Round-4 second-resume schedule.  The first resume window was lost to
# gateway errors and the post-reboot cold compile cache: with no persistent
# cache, the first GAN train-step compile over the remote device link ran
# past the stall watchdog's fuse, which killed the segment into a
# recompile loop.  Consequences baked in here:
#   * --stall_exit_s 1200 (first iteration gets 2x grace in bin/train.py,
#     so a cold segment may compile for up to 40 min before the watchdog
#     calls it a hang);
#   * hifigan trains with --discriminator_train_start_steps 0: one
#     compiled program instead of two (the pre-adv->GAN transition is a
#     second multi-minute compile), and adversarial-from-scratch is the
#     standard HiFiGAN recipe anyway;
#   * each family gets its OWN hard wall-clock window (TRAIN_DEADLINE_EPOCH
#     is enforced inside the trainer step loop) — a single global deadline
#     starves whichever family runs second;
#   * hifigan's post-processing runs on CPU (JAX_PLATFORMS=cpu) in the
#     background so basis-melgan takes the chip the moment hifigan's
#     window closes;
#   * basis-melgan is expected to stay in its weight-L1 phase
#     (disc_start 1000 is likely past the window) — the demo comparison
#     is still an honest uncontaminated number, caveated as
#     pre-adversarial in the output's protocol note.
#
# Usage:  HIFIGAN_DEADLINE=<epoch> BASIS_DEADLINE=<epoch> \
#             nohup bash tools/round4b_session.sh >> runs/round4_schedule.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

: "${HIFIGAN_DEADLINE:?}"; : "${BASIS_DEADLINE:?}"
export SEGMENT_STEPS="${SEGMENT_STEPS:-2500}"
STOP_FILE="${STOP_FILE:-/tmp/stop_training}"

CLEAN_ARGS=(
  --audio_index_path dataset/clean_audio/train
  --mel_index_path dataset/clean_mel/train
  --audio_index_valid_path dataset/clean_audio/valid
  --mel_index_valid_path dataset/clean_mel/valid
  --save_step 2500 --valid_step 1250 --batch_expand_size 1
  --stall_exit_s 1200
)
PROTOCOL_NOTE="clean-split: trained only on LJSpeech clips 1-6 (3-way \
speed-perturbed, tools/make_clean_corpus.py); LJSpeech clip 0 — the \
utterance all reference demo wavs render — and the demo wavs themselves \
were excluded from training at every speed"

train_family() {  # <run_name> <max_steps> <deadline> <model> <config> <disc_start> [extra...]
  local run_name="$1" max_steps="$2" deadline="$3" model_name="$4" config="$5" disc_start="$6"
  shift 6
  if [ -e "$STOP_FILE" ] || [ $(( deadline - $(date +%s) )) -lt 600 ]; then
    echo "schedule: skipping $run_name (stop/deadline)"; return 1
  fi
  echo "=== $(date -u +%H:%M:%S) training $run_name (max $max_steps, window $(( deadline - $(date +%s) ))s) ==="
  rm -rf "runs/$run_name"; mkdir -p "runs/$run_name"
  DEADLINE_EPOCH="$deadline" TRAIN_DEADLINE_EPOCH="$deadline" \
  RUN_DIR="runs/$run_name" bash tools/train_supervised.sh "$max_steps" \
      "runs/$run_name/train.log" \
      --model_name "$model_name" --config "$config" \
      --discriminator_train_start_steps "$disc_start" \
      "${CLEAN_ARGS[@]}" "$@"
}

post_process() {  # <run_name> <model_name> <config> <phase_note>
  local run_name="$1" model_name="$2" config="$3" phase_note="${4:-}"
  local R="runs/$run_name"
  echo "=== $(date -u +%H:%M:%S) post-processing $run_name (platform=${JAX_PLATFORMS:-device}) ==="
  python3 tools/summarize_run.py "$R/logger" --tensorboard "$R/tensorboard" \
      --csv_out "docs/convergence_${run_name}.csv" || true
  python3 tools/eval_checkpoints.py --checkpoint_root "$R/checkpoint" \
      --model_name "$model_name" --config "$config" \
      --audio_index_path dataset/clean_audio/eval \
      --mel_index_path dataset/clean_mel/eval \
      --csv_out "docs/quality_${run_name}.csv" || true
  local ckpt
  ckpt="$(find "$R/checkpoint" -name 'checkpoint_*.pth.tar' \
      | sed -E 's/(.*checkpoint_)([0-9]+)(\.pth\.tar)/\2 \0/' | sort -n | tail -1 \
      | cut -d' ' -f2)"
  [ -z "$ckpt" ] && { echo "no checkpoint for $run_name"; return 0; }
  local eval_mel
  eval_mel="$(head -1 dataset/clean_mel/eval)"
  bash synthesize.sh "$ckpt" "$eval_mel" \
      "docs/samples/${run_name}_clip0.wav" "$model_name" "$config" || true
  local demos=(/root/reference/resource/demo/ljspeech/0.wav)
  case "$model_name/$config" in
    hifigan/*light*) demos+=(/root/reference/resource/demo/0.hifigan.light.705000.wav);;
    basis-melgan/*) demos+=(/root/reference/resource/demo/0.basis.melgan.light.815000.remove.wav);;
  esac
  python3 tools/compare_to_reference_demo.py --checkpoint_path "$ckpt" \
      --model_name "$model_name" --config "$config" \
      --demo_wav "${demos[@]}" --save_dir docs/samples \
      --protocol_note "$PROTOCOL_NOTE${phase_note:+; $phase_note}" \
      --output "docs/demo_comparison_${run_name}.json" || true
  echo "=== $(date -u +%H:%M:%S) $run_name post-processing done ==="
}

# 1. hifigan-light clean (VERDICT item 2: uncontaminated demo comparison),
#    adversarial from step 0
train_family hifigan_light_clean 8000 "$HIFIGAN_DEADLINE" \
    hifigan conf/hifigan/light.yaml 0
# post-process whenever ANY checkpoint landed (the supervisor may exit
# non-zero after a deadline stop, but a saved tail checkpoint is usable)
HIFIGAN_TRAINED=1
find runs/hifigan_light_clean/checkpoint -name 'checkpoint_*.pth.tar' 2>/dev/null \
    | grep -q . && HIFIGAN_TRAINED=0

# 2. basis-melgan takes the chip immediately; hifigan post-processing runs
#    on CPU in the background (single-core host: the basis trainer's first
#    ~10 min is a remote compile that barely needs host CPU)
if [ "$HIFIGAN_TRAINED" -eq 0 ]; then
  JAX_PLATFORMS=cpu post_process hifigan_light_clean hifigan conf/hifigan/light.yaml \
      > runs/hifigan_light_clean/post.log 2>&1 &
  POST_PID=$!
else
  POST_PID=""
fi

if [ -f dataset/clean_basis/basis_signal_weight.npy ] \
    && [ -d dataset/clean_basis/weight ]; then
  train_family basis_melgan_clean 5000 "$BASIS_DEADLINE" \
      basis-melgan conf/basis-melgan/light.yaml 1000 \
      --basis_dataset_path dataset/clean_basis
  BASIS_TRAINED=1
  find runs/basis_melgan_clean/checkpoint -name 'checkpoint_*.pth.tar' 2>/dev/null \
      | grep -q . && BASIS_TRAINED=0
else
  echo "schedule: dataset/clean_basis not ready, skipping basis run"
  BASIS_TRAINED=1
fi

[ -n "$POST_PID" ] && wait "$POST_PID" 2>/dev/null

if [ "$BASIS_TRAINED" -eq 0 ]; then
  post_process basis_melgan_clean basis-melgan conf/basis-melgan/light.yaml \
      "checkpoint is from the weight-L1 (pre-adversarial) phase if its step \
count is below discriminator_train_start_steps=1000"
fi

echo "=== $(date -u +%H:%M:%S) schedule complete ==="
