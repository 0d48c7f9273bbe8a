# usage: bash publish.sh <checkpoint> <model_name> <config> <save_path>
checkpoint=$1
model_name=$2
config=$3
save_path=$4

export MODE=publish

python3 fastvocoder_tpu/bin/launcher.py \
    --checkpoint_path $checkpoint \
    --model_name $model_name \
    --config $config \
    --save_path $save_path
