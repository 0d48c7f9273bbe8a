#!/usr/bin/env bash
# Round-4 RESUME schedule: the host VM rebooted mid-round and took the
# in-flight clean-protocol runs (tools/round4_clean_runs.sh) and their
# gitignored artifacts (runs/, dataset/clean_processed/) with it.  This
# is the remaining-chip-time re-plan: same clean protocol, reprioritized
# and right-sized for ~90 min of chip instead of the original ~5 h.
#
#   1. hifigan-light clean 10k (VERDICT r03 item 2 — the highest-leverage
#      quality ask: an UNCONTAMINATED demo comparison)
#   2. basis-melgan clean 5k (VERDICT item 3 — the 815k demo comparison;
#      round-3 showed basis quality is flat past ~2.5k, disc starts 2000)
#   3. nhv clean (VERDICT item 8) only if time somehow remains
#
# Usage:  DEADLINE_EPOCH=<unix-s> nohup bash tools/round4_resume.sh \
#             >> runs/round4_schedule.log 2>&1 &
# DEADLINE_EPOCH propagates to every supervisor segment so nothing is
# live on the chip during the driver's BENCH_r04 capture (r03 weak 1).
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
  local eval_mel
  eval_mel="$(head -1 dataset/clean_mel/eval)"
  bash synthesize.sh "$ckpt" "$eval_mel" \
      "docs/samples/${run_name}_clip0.wav" "$model_name" "$config" || true
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

# 1. hifigan-light clean 10k — item 2, the highest-leverage quality ask
run_family hifigan_light_clean10k 10000 hifigan conf/hifigan/light.yaml 2000

# 2. basis-melgan clean 5k — item 3 (the 815k demo comparison)
if [ -f dataset/clean_basis/basis_signal_weight.npy ] \
    && [ -d dataset/clean_basis/weight ]; then
  run_family basis_melgan_clean5k 5000 basis-melgan \
      conf/basis-melgan/light.yaml 2000 \
      --basis_dataset_path dataset/clean_basis
else
  echo "schedule: dataset/clean_basis not ready, skipping basis run"
fi

# 3. nhv clean 5k — item 8, only if the deadline somehow allows
run_family nhv_clean5k 5000 nhv conf/nhv/default.yaml 2000

echo "=== $(date -u +%H:%M:%S) schedule complete ($(remaining)s before deadline) ==="
