#!/usr/bin/env bash
# Round-5 training schedule: clean-protocol runs for EVERY model family on
# the expanded-augmentation corpus (tools/make_clean_corpus.py --speeds
# 0.85..1.15 --gains 1.0 0.6 -> 302 train utterances, ~4.9x round-4), with
# the flagship Basis-MelGAN first and through its adversarial phase
# (VERDICT r04 item 2).  Differences from round-4b baked in:
#
#   * --device_cache (auto-on): whole corpus staged in HBM, crops gathered
#     on device — kills the per-step H2D that made basis-melgan 1.3-2.0
#     s/step and the axon host-RAM transfer leak that forced short
#     segments;
#   * per-family deadlines are computed DYNAMICALLY at family start
#     (weighted share of the time left), so a family finishing early
#     donates its slack to the rest instead of leaving the chip idle;
#   * post-processing runs with --cpu (in-process platform forcing,
#     ADVICE r04 item 1) in the background so it never contends with the
#     next family's training;
#   * basis-melgan's GAN-step program is precompiled by
#     tools/warm_gan_steps.sh before this schedule, so the pre-adv->GAN
#     transition mid-run hits the persistent cache instead of a cold
#     multi-minute compile racing the stall watchdog.
#
# Usage:  SCHEDULE_DEADLINE=<unix-s> nohup bash tools/round5_session.sh \
#             >> runs/round5_schedule.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

: "${SCHEDULE_DEADLINE:?set SCHEDULE_DEADLINE (unix seconds)}"
export SEGMENT_STEPS="${SEGMENT_STEPS:-10000}"
STOP_FILE="${STOP_FILE:-/tmp/stop_training}"

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

remaining() { echo $(( SCHEDULE_DEADLINE - $(date +%s) )); }

# weights: flagship basis gets the largest share, then the hifigan depth
# extension (VERDICT item 3), then the families with no clean artifacts yet
WSUM=100

family_deadline() {  # <weight> -> epoch; consumes <weight> from WSUM
  local w="$1" rem
  rem=$(remaining)
  [ "$rem" -lt 0 ] && rem=0
  local d=$(( $(date +%s) + rem * w / WSUM ))
  WSUM=$(( WSUM - w ))
  echo "$d"
}

train_family() {  # <run_name> <weight> <max_steps> <model> <config> <disc_start> [extra...]
  local run_name="$1" weight="$2" max_steps="$3" model_name="$4" config="$5" disc_start="$6"
  shift 6
  local deadline
  deadline="$(family_deadline "$weight")"
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
  # checkpoint SELECTION on the valid split (held-out segments of the
  # TRAINING clips) — never on the clip-0 eval split the demo comparison
  # scores, so selection stays uncontaminated
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
  echo "=== $(date -u +%H:%M:%S) $run_name post-processing done ==="
}

post_bg() {  # run post_process in the background, logging into the run dir
  local run_name="$1"
  if find "runs/$run_name/checkpoint" -name 'checkpoint_*.pth.tar' 2>/dev/null | grep -q .; then
    post_process "$@" > "runs/$run_name/post.log" 2>&1 &
    echo "post-processing $run_name in background (pid $!)"
  else
    echo "no checkpoints for $run_name; skipping post-processing"
  fi
}

# 1. FLAGSHIP: basis-melgan clean through the adversarial phase
#    (VERDICT r04 item 2: >=10k steps, disc starts at 2000).  The GAN-step
#    program is precompiled first so the mid-run phase transition is a
#    cache hit instead of a cold compile racing the stall watchdog.
if [ -f dataset/clean_basis/basis_signal_weight.npy ] \
    && [ -d dataset/clean_basis/weight ]; then
  bash tools/warm_gan_steps.sh basis
  train_family basis_melgan_clean2 33 24000 basis-melgan \
      conf/basis-melgan/light.yaml 2000 \
      --basis_dataset_path dataset/clean_basis
  post_bg basis_melgan_clean2 basis-melgan conf/basis-melgan/light.yaml \
      "GAN phase from step 2000"
else
  echo "schedule: dataset/clean_basis not ready, SKIPPING the flagship run"
fi

# 2. hifigan-light clean depth extension (VERDICT item 3): fresh run on the
#    expanded corpus; its step-2500 quality row doubles as the corpus A/B
#    against round-4's 3-speed run (docs/quality_hifigan_light_clean.csv)
train_family hifigan_light_clean2 30 30000 hifigan conf/hifigan/light.yaml 0
post_bg hifigan_light_clean2 hifigan conf/hifigan/light.yaml

# 3. mb-hifigan-light clean window (VERDICT item 4)
train_family mb_hifigan_light_clean 14 12000 multiband-hifigan \
    conf/multiband-hifigan/light.yaml 0
post_bg mb_hifigan_light_clean multiband-hifigan conf/multiband-hifigan/light.yaml

# 4. NHV clean window (VERDICT item 4; beyond-reference family).
#    Adversarial from step 0: one compiled program for the whole window —
#    a mid-window phase transition would pay a second cold compile
train_family nhv_clean 13 12000 nhv conf/nhv/default.yaml 0
post_bg nhv_clean nhv conf/nhv/default.yaml

# 5. melgan clean window (VERDICT item 4 "if time allows")
train_family melgan_clean 10 10000 melgan conf/melgan/original.yaml 0
post_bg melgan_clean melgan conf/melgan/original.yaml

wait
echo "=== $(date -u +%H:%M:%S) schedule complete ($(remaining)s before deadline) ==="
