#!/bin/bash
# GRPO RL recipe for the CosyVoice2 speech-token LM — the reference
# examples/grpo/cosyvoice2/run.sh (veRL GRPO + token2wav+ASR reward server).
# TPU-native stages: prompt jsonl -> reward server -> rl_grpo loop -> eval.
set -e
export PYTHONPATH=../../..:$PYTHONPATH

stage=0
stop_stage=2

pretrained_model_dir=${PRETRAINED:-../../../pretrained_models/CosyVoice2-0.5B}
reward_port=${REWARD_PORT:-8000}
# ASR hook for the reward server: module:function -> fn(wav, sr) -> str
# (the reference uses SenseVoice; plug any transcriber available on the host)
asr=${ASR:?set ASR=module:function for the reward transcriber}

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "Stage 0: prompts jsonl from kaldi text files"
  python prepare_data.py --text ../../libritts/cosyvoice2/data/train-clean-100/text --out prompts.jsonl
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: start the token2wav+ASR reward server (background)"
  python -m cosyvoice_tpu.serving.reward_server \
    --model_dir $pretrained_model_dir --asr $asr --port $reward_port &
  echo $! > reward_server.pid
  sleep 5
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: GRPO loop (K rollouts/prompt, group-normalized advantages, PPO-clip + KL-to-ref)"
  python -m cosyvoice_tpu.bin.rl_grpo \
    --train_data prompts.jsonl \
    --checkpoint $pretrained_model_dir/llm.msgpack \
    --tokenizer_path $pretrained_model_dir/tokenizer \
    --reward_url http://127.0.0.1:${reward_port}/v2/models/reward/infer \
    --model_dir `pwd`/exp/grpo
  kill $(cat reward_server.pid) 2>/dev/null || true
fi
