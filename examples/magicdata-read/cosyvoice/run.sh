#!/bin/bash
# LibriTTS CosyVoice2 recipe — TPU-native stages mirroring the reference
# examples/magicdata-read/cosyvoice/run.sh (data prep → features → parquet →
# train llm/flow/hifigan → average → AOT warmup, which is the TPU analog of
# the reference's export_jit/export_onnx stage).
set -e
export PYTHONPATH=../../..:$PYTHONPATH

stage=0
stop_stage=7

data_dir=${DATA_DIR:-/data/tts/openslr/magicdata-read}   # LibriTTS extracted here
pretrained_model_dir=${PRETRAINED:-../../../pretrained_models/CosyVoice-300M}
parts="train dev test"

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "Stage 0: prepare wav.scp/text/utt2spk/spk2utt"
  for x in $parts; do
    mkdir -p data/$x
    python local/prepare_data.py --src_dir $data_dir/$x --des_dir data/$x
  done
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: CAM++ speaker embeddings (utt2embedding.pkl / spk2embedding.pkl)"
  for x in $parts; do
    python -m cosyvoice_tpu.tools.extract_embedding --dir data/$x
  done
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: S3 speech tokens (utt2speech_token.pkl)"
  for x in $parts; do
    python -m cosyvoice_tpu.tools.extract_speech_token --dir data/$x
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: pack parquet shards + data.list"
  for x in $parts; do
    mkdir -p data/$x/parquet
    python -m cosyvoice_tpu.tools.make_parquet_list --num_utts_per_parquet 1000 \
      --sample_rate 22050 --src_dir data/$x --des_dir data/$x/parquet
  done
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: merge train/dev lists"
  cat data/train/parquet/data.list > data/train.data.list
  cat data/dev/parquet/data.list > data/dev.data.list
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "Stage 5: train llm / flow / hifigan (single- or multi-host via --multihost)"
  for model in llm flow hifigan; do
    python -m cosyvoice_tpu.bin.train \
      --config conf/cosyvoice.json \
      --model $model \
      --train_data data/train.data.list \
      --cv_data data/dev.data.list \
      --checkpoint $pretrained_model_dir/$model.msgpack \
      --tokenizer_path $pretrained_model_dir/tokenizer \
      --model_dir `pwd`/exp/cosyvoice/$model
  done
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "Stage 6: average best-5 checkpoints by CV loss"
  for model in llm flow hifigan; do
    python -m cosyvoice_tpu.bin.average_model \
      --src_dir `pwd`/exp/cosyvoice/$model \
      --model_name $model --num 5 \
      --dst_model `pwd`/exp/cosyvoice/$model/$model.msgpack
  done
fi

if [ ${stage} -le 7 ] && [ ${stop_stage} -ge 7 ]; then
  echo "Stage 7: AOT warmup (persistent XLA cache over all engine buckets — the export stage)"
  python -m cosyvoice_tpu.bin.aot_warmup --model_dir $pretrained_model_dir
fi
