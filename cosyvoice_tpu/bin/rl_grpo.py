"""GRPO RL fine-tuning entry point for the speech-token LM.

TPU-native equivalent of the reference's veRL recipe driver
(examples/grpo/cosyvoice2/run.sh stage 2 -> verl.trainer.main_ppo with
algorithm.adv_estimator=grpo, custom_reward_function.path=reward_tts.py):

  python -m cosyvoice_tpu.bin.rl_grpo --train_data prompts.jsonl \
      --model_dir exp/grpo [--checkpoint lm.msgpack] \
      [--reward_path mypkg.rewards:cer_reward | --reward_url http://host:8000/...]

prompts.jsonl: one JSON object per line with at least {"text": ...}
(prepare_data.py schema). The reward is either a python callable
``fn(tokens: np.ndarray, ground_truth: str) -> float`` resolved from
--reward_path, or the reference's token2wav+ASR KServe endpoint via
--reward_url (grpo.http_reward).
"""

import argparse
import importlib
import json
import logging
import os

import jax
import numpy as np


def resolve_reward(args):
    if args.reward_url:
        from cosyvoice_tpu.train.grpo import http_reward

        return http_reward(args.reward_url)
    if args.reward_path:
        mod, _, fn = args.reward_path.partition(":")
        return getattr(importlib.import_module(mod), fn or "reward")
    raise SystemExit("one of --reward_path / --reward_url is required")


def build_prompt(cfg, tokenizer, text: str):
    """Zero-shot-free RL prompt [sos, text, task] (the recipe trains on bare
    text prompts; prepare_data.py wraps each sample the same way)."""
    from cosyvoice_tpu.models.llm import TYPE_SPECIAL, TYPE_TEXT

    tt = np.asarray(tokenizer.encode(text), np.int32)
    ids = np.concatenate([[cfg.sos_id], tt, [cfg.task_id]]).astype(np.int32)
    types = np.concatenate([[TYPE_SPECIAL], np.full(len(tt), TYPE_TEXT), [TYPE_SPECIAL]]).astype(np.int32)
    return {"ids": ids, "types": types, "n_text": len(tt), "ground_truth": text}


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_data", required=True, help="jsonl with {'text': ...} per line")
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--tokenizer_path", default="")
    parser.add_argument("--reward_path", default="", help="module:function reward")
    parser.add_argument("--reward_url", default="", help="token2wav+ASR KServe endpoint")
    parser.add_argument("--group_size", type=int, default=8)
    parser.add_argument("--clip_eps", type=float, default=0.2)
    parser.add_argument("--kl_coef", type=float, default=1e-3)
    parser.add_argument("--lr", type=float, default=1e-6)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--save_per_step", type=int, default=100)
    parser.add_argument("--seed", type=int, default=1986)
    parser.add_argument("--config", default="", help="json with LMConfig overrides, e.g. {\"qwen\": {...}}")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import optax

    from cosyvoice_tpu.frontend.tokenizer import get_tokenizer
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.runtime.api import _load_msgpack, _save_msgpack
    from cosyvoice_tpu.train.grpo import GRPOConfig, grpo_step, make_grpo_train_step, make_logps_fn
    from cosyvoice_tpu.utils.devices import init_on_cpu, to_default_device

    reward_fn = resolve_reward(args)
    tokenizer = get_tokenizer(args.tokenizer_path or None)
    cfg = GRPOConfig(group_size=args.group_size, clip_eps=args.clip_eps, kl_coef=args.kl_coef)

    if args.config:
        from cosyvoice_tpu.models.qwen2 import Qwen2Config

        with open(args.config) as f:
            d = json.load(f)
        qwen = d.pop("qwen", None)
        if qwen and isinstance(qwen.get("dtype"), str):
            import jax.numpy as jnp

            qwen["dtype"] = getattr(jnp, qwen["dtype"])
        lm_cfg = LMConfig(**d, **({"qwen": Qwen2Config(**qwen)} if qwen else {}))
    else:
        lm_cfg = LMConfig()
    lm = Qwen2LM(lm_cfg)
    with init_on_cpu():
        params = lm.init(jax.random.PRNGKey(args.seed))
    if args.checkpoint:
        params = _load_msgpack(args.checkpoint, params)
    params = to_default_device(params)
    # frozen reference policy (KL anchor) — must be a COPY: the train step
    # donates the policy params' buffers, so an alias would be deleted after
    # the first update
    ref_params = jax.tree_util.tree_map(lambda x: x.copy(), params)

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(args.lr))
    opt_state = optimizer.init(params)
    train_step = make_grpo_train_step(lm.module, optimizer, cfg.clip_eps, cfg.kl_coef)
    logps_fn = make_logps_fn(lm.module)

    prompts = []
    with open(args.train_data) as f:
        for line in f:
            line = line.strip()
            if line:
                prompts.append(build_prompt(lm.cfg, tokenizer, json.loads(line)["text"]))
    logging.info("GRPO: %d prompts, K=%d", len(prompts), cfg.group_size)

    os.makedirs(args.model_dir, exist_ok=True)
    step = 0
    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        for i, p in enumerate(prompts):
            params, opt_state, metrics = grpo_step(
                lm, params, opt_state, [p], reward_fn, jax.random.fold_in(key, step),
                cfg, train_step, logps_fn, ref_params, step,
            )
            step += 1
            logging.info("epoch %d step %d: %s", epoch, step,
                         {k: float(v) for k, v in metrics.items()})
            if args.save_per_step > 0 and step % args.save_per_step == 0:
                _save_msgpack(os.path.join(args.model_dir, f"lm_grpo_step{step}.msgpack"), params)
    _save_msgpack(os.path.join(args.model_dir, "lm_grpo.msgpack"), params)


if __name__ == "__main__":
    main()
