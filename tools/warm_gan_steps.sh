#!/usr/bin/env bash
# Precompile the GAN-phase train-step programs into the persistent compile
# cache (fastvocoder_tpu.default_cache_dir) BEFORE long runs / benchmark
# capture.  Rationale: the pre-adv -> GAN transition happens mid-segment,
# where a cold GAN-step compile over the remote link (up to ~15-25 min,
# round-4b header) races the stall watchdog's fuse; compiled once here, the
# transition is a cache hit.  Each warm run is a REAL 3-step training run
# with --discriminator_train_start_steps 0 at schedule geometry (batch 32,
# fixed_length 140, batch_expand 1), so the cache keys match exactly.
#
# Usage: bash tools/warm_gan_steps.sh [basis|hifigan|mb|nhv|melgan ...]
# (defaults to all five; each takes ~1-6 min cold, seconds warm)
set -u
cd "$(dirname "$0")/.."

FAMILIES=("$@")
[ ${#FAMILIES[@]} -eq 0 ] && FAMILIES=(basis hifigan mb nhv melgan)

COMMON=(
  --audio_index_path dataset/clean_audio/train
  --mel_index_path dataset/clean_mel/train
  --audio_index_valid_path dataset/clean_audio/valid
  --mel_index_valid_path dataset/clean_mel/valid
  --discriminator_train_start_steps 0 --max_steps 3
  --save_step 100000 --valid_step 100000 --batch_expand_size 1
)

warm() {  # <tag> <model_name> <config> [extra...]
  local tag="$1" model="$2" config="$3"
  shift 3
  echo "=== $(date -u +%H:%M:%S) warming $tag GAN step ==="
  rm -rf "/tmp/warm_$tag"
  MODE=train timeout 2400 python3 -m fastvocoder_tpu.bin.launcher \
      --model_name "$model" --config "$config" \
      --run_dir "/tmp/warm_$tag" "${COMMON[@]}" "$@" \
      > "/tmp/warm_$tag.log" 2>&1 \
    && echo "warmed $tag" || echo "WARM FAILED for $tag (see /tmp/warm_$tag.log)"
  rm -rf "/tmp/warm_$tag"
}

for f in "${FAMILIES[@]}"; do
  case "$f" in
    basis)   warm basis basis-melgan conf/basis-melgan/light.yaml \
                 --basis_dataset_path dataset/clean_basis;;
    hifigan) warm hifigan hifigan conf/hifigan/light.yaml;;
    mb)      warm mb multiband-hifigan conf/multiband-hifigan/light.yaml;;
    nhv)     warm nhv nhv conf/nhv/default.yaml;;
    melgan)  warm melgan melgan conf/melgan/original.yaml;;
    *)       echo "unknown family $f";;
  esac
done
echo "=== $(date -u +%H:%M:%S) warm_gan_steps done ==="
