#!/bin/bash
# DPO finetune of the CosyVoice2 LM (the reference run_dpo.sh): generate
# reject samples with the SFT model, extract their speech tokens, pack
# parquet with reject_speech_token columns, train with --dpo.
set -e
export PYTHONPATH=../../..:$PYTHONPATH

stage=0
stop_stage=5

data_dir=${DATA_DIR:-/data/tts/openslr/libritts}
pretrained_model_dir=${PRETRAINED:-../../../pretrained_models/CosyVoice2-0.5B}
train_parts="train-clean-100 train-clean-360 train-other-500"
all_parts="$train_parts dev-clean dev-other"

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  for x in $all_parts; do
    mkdir -p data/$x
    python ../local/prepare_data.py --src_dir $data_dir/LibriTTS/$x --des_dir data/$x
  done
  echo "Stage 0b: reject samples via SFT-model re-synthesis"
  for x in $train_parts; do
    mkdir -p data/${x}_reject
    python local/prepare_reject_sample.py --src_dir data/$x --des_dir data/${x}_reject --ref_model $pretrained_model_dir
  done
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  for x in $all_parts; do
    python -m cosyvoice_tpu.tools.extract_embedding --dir data/$x
  done
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  for x in $all_parts train-clean-100_reject train-clean-360_reject train-other-500_reject; do
    python -m cosyvoice_tpu.tools.extract_speech_token --dir data/$x
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  for x in $train_parts; do
    mkdir -p data/$x/parquet
    python -m cosyvoice_tpu.tools.make_parquet_list --num_utts_per_parquet 1000 \
      --dpo --src_dir data/$x --des_dir data/$x/parquet
  done
  for x in dev-clean dev-other; do
    mkdir -p data/$x/parquet
    python -m cosyvoice_tpu.tools.make_parquet_list --num_utts_per_parquet 1000 \
      --src_dir data/$x --des_dir data/$x/parquet
  done
  cat data/{train-clean-100,train-clean-360,train-other-500}/parquet/data.list > data/train.data.list
  cat data/{dev-clean,dev-other}/parquet/data.list > data/dev.data.list
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: DPO training (frozen SFT reference model, sigmoid DPO loss)"
  python -m cosyvoice_tpu.bin.train \
    --config conf/cosyvoice2.json \
    --model llm --dpo \
    --train_data data/train.data.list \
    --cv_data data/dev.data.list \
    --checkpoint $pretrained_model_dir/llm.msgpack \
    --tokenizer_path $pretrained_model_dir/tokenizer \
    --model_dir `pwd`/exp/cosyvoice2_dpo/llm
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  python -m cosyvoice_tpu.bin.average_model \
    --src_dir `pwd`/exp/cosyvoice2_dpo/llm --model_name llm --num 5 \
    --dst_model `pwd`/exp/cosyvoice2_dpo/llm/llm.msgpack
fi
