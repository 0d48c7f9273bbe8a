#!/usr/bin/env bash
# Round-4 clean-protocol training schedule (VERDICT r03 items 2-4, 8).
#
# Runs the four model families sequentially on the CLEAN corpus built by
# tools/make_clean_corpus.py (LJSpeech clips 1-6 speed-perturbed; clip 0 —
# the utterance every reference demo wav renders — never trained at any
# speed), then post-processes each run: merged convergence CSVs
# (tools/summarize_run.py), per-checkpoint held-out quality on the UNSEEN
# clip-0 eval split (tools/eval_checkpoints.py), a checked-in sample, and
# the uncontaminated demo comparisons (tools/compare_to_reference_demo.py
# vs both the reference's published demo wav and the clip-0 ground truth).
#
# Usage:  DEADLINE_EPOCH=<unix-s> nohup bash tools/round4_clean_runs.sh \
#             >> runs/round4_schedule.log 2>&1 &
# The deadline propagates to every supervisor segment, so nothing is live
# on the chip during the driver's end-of-round benchmark capture
# (VERDICT r03 weak 1).  Touch /tmp/stop_training to stop early.
set -u
cd "$(dirname "$0")/.."

: "${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix seconds)}"
export DEADLINE_EPOCH
export SEGMENT_STEPS="${SEGMENT_STEPS:-2500}"
STOP_FILE="${STOP_FILE:-/tmp/stop_training}"

CLEAN_ARGS=(
  --audio_index_path dataset/clean_audio/train
  --mel_index_path dataset/clean_mel/train
  --audio_index_valid_path dataset/clean_audio/valid
  --mel_index_valid_path dataset/clean_mel/valid
  --save_step 2500 --valid_step 500 --batch_expand_size 1
)
PROTOCOL_NOTE="clean-split: trained only on LJSpeech clips 1-6 (3-way \
speed-perturbed, tools/make_clean_corpus.py); LJSpeech clip 0 — the \
utterance all reference demo wavs render — and the demo wavs themselves \
were excluded from training at every speed"

remaining() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

run_family() {  # <run_name> <max_steps> <model_name> <config> <disc_start> [extra args...]
  local run_name="$1" max_steps="$2" model_name="$3" config="$4" disc_start="$5"
  shift 5
  if [ -e "$STOP_FILE" ] || [ "$(remaining)" -lt 900 ]; then
    echo "schedule: skipping $run_name (stop/deadline)"; return 0
  fi
  echo "=== $(date -u +%H:%M:%S) training $run_name (max $max_steps, $(remaining)s left) ==="
  rm -rf "runs/$run_name"; mkdir -p "runs/$run_name"
  RUN_DIR="runs/$run_name" bash tools/train_supervised.sh "$max_steps" \
      "runs/$run_name/train.log" \
      --model_name "$model_name" --config "$config" \
      --discriminator_train_start_steps "$disc_start" \
      "${CLEAN_ARGS[@]}" "$@"
  post_process "$run_name" "$max_steps" "$model_name" "$config"
}

post_process() {  # <run_name> <max_steps> <model_name> <config>
  local run_name="$1" max_steps="$2" model_name="$3" config="$4"
  local R="runs/$run_name"
  echo "=== $(date -u +%H:%M:%S) post-processing $run_name ==="
  python3 tools/summarize_run.py "$R/logger" --tensorboard "$R/tensorboard" \
      --csv_out "docs/convergence_${run_name}.csv" || true
  python3 tools/eval_checkpoints.py --checkpoint_root "$R/checkpoint" \
      --model_name "$model_name" --config "$config" \
      --audio_index_path dataset/clean_audio/eval \
      --mel_index_path dataset/clean_mel/eval \
      --csv_out "docs/quality_${run_name}.csv" || true
  local ckpt
  ckpt="$(find "$R/checkpoint" -name "checkpoint_${max_steps}.pth.tar" | head -1)"
  [ -z "$ckpt" ] && ckpt="$(find "$R/checkpoint" -name 'checkpoint_*.pth.tar' \
      | sed -E 's/(.*checkpoint_)([0-9]+)(\.pth\.tar)/\2 \0/' | sort -n | tail -1 \
      | cut -d' ' -f2)"
  [ -z "$ckpt" ] && { echo "no checkpoint for $run_name"; return 0; }
  # sample from the unseen clip-0 eval mel
  local eval_mel
  eval_mel="$(head -1 dataset/clean_mel/eval)"
  bash synthesize.sh "$ckpt" "$eval_mel" \
      "docs/samples/${run_name}_clip0.wav" "$model_name" "$config" || true
  # uncontaminated comparisons: reference demo wav (if one exists for the
  # family) + the clip-0 ground truth (copy-synthesis on unseen speech)
  local demos=(/root/reference/resource/demo/ljspeech/0.wav)
  case "$model_name/$config" in
    hifigan/*light*) demos+=(/root/reference/resource/demo/0.hifigan.light.705000.wav);;
    hifigan/*large*) demos+=(/root/reference/resource/demo/0.hifigan.large.355000.wav);;
    multiband-hifigan/*light*) demos+=(/root/reference/resource/demo/0.multiband.hifigan.light.845000.remove.wav);;
    multiband-hifigan/*large*) demos+=(/root/reference/resource/demo/0.multiband.hifigan.large.945000.wav);;
    basis-melgan/*) demos+=(/root/reference/resource/demo/0.basis.melgan.light.815000.remove.wav);;
  esac
  python3 tools/compare_to_reference_demo.py --checkpoint_path "$ckpt" \
      --model_name "$model_name" --config "$config" \
      --demo_wav "${demos[@]}" --save_dir docs/samples \
      --protocol_note "$PROTOCOL_NOTE" \
      --output "docs/demo_comparison_${run_name}.json" || true
  echo "=== $(date -u +%H:%M:%S) $run_name done ==="
}

# 1. hifigan-light 30k: the deepest run (VERDICT item 4: more data, more
#    steps, clean protocol)
run_family hifigan_light_clean30k 30000 hifigan conf/hifigan/light.yaml 3000

# 2. basis-melgan clean 20k: the flagship + the 815k demo comparison the
#    CHANGELOG promises (VERDICT item 3), on the clean corpus (item 2)
if [ -f dataset/clean_basis/basis_signal_weight.npy ]; then
  run_family basis_melgan_clean20k 20000 basis-melgan \
      conf/basis-melgan/light.yaml 2000 \
      --basis_dataset_path dataset/clean_basis
else
  echo "schedule: dataset/clean_basis not ready, skipping basis run"
fi

# 3. NHV 15k: the beyond-reference family at the same evidentiary bar
#    (VERDICT item 8)
run_family nhv_clean15k 15000 nhv conf/nhv/default.yaml 2000

# 4. mb-hifigan-light 12k if time remains
run_family mb_hifigan_light_clean12k 12000 multiband-hifigan \
    conf/multiband-hifigan/light.yaml 2000

echo "=== $(date -u +%H:%M:%S) schedule complete ($(remaining)s before deadline) ==="
