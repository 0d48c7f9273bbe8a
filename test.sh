# usage: bash test.sh <checkpoint> <mel_dir> <model_name> <config>
checkpoint=$1
filelist=$2
model_name=$3
config=$4

export MODE=test

python3 fastvocoder_tpu/bin/launcher.py \
    --checkpoint_path $checkpoint \
    --model_name $model_name \
    --config $config \
    --file_path $filelist
