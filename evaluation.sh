# usage: bash evaluation.sh <checkpoint> <model_name> <config> [audio_index] [mel_index]
# working replacement for the reference's broken bin/evaluation.py
checkpoint=$1
model_name=$2
config=$3
audio_index=${4:-dataset/audio/eval}
mel_index=${5:-dataset/mel/eval}

export MODE=evaluation

python3 fastvocoder_tpu/bin/launcher.py \
    --checkpoint_path $checkpoint \
    --model_name $model_name \
    --config $config \
    --audio_index_path $audio_index \
    --mel_index_path $mel_index
