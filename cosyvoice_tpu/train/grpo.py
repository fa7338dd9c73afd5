"""GRPO (Group Relative Policy Optimization) for the speech-token LM.

TPU-native re-design of the reference's veRL-based RL recipe
(examples/grpo/cosyvoice2/README.md, run.sh stage 2, reward_tts.py):

- K rollouts per prompt are sampled from the current policy with the
  blockwise arena decoder (`Qwen2LM.generate` — the role vLLM plays in the
  reference's verl rollout worker).
- Rewards come from a pluggable ``reward_fn(tokens, ground_truth) -> float``;
  the reference scores pinyin-level CER through a token2wav+ASR Triton
  server (reward_tts.py:33-76) — ``http_reward`` is the same client on
  stdlib urllib, and any ``module:function`` path can be swapped in via
  ``bin/rl_grpo.py --reward_path``.
- Advantages are group-normalized rewards (verl ``algorithm.adv_estimator=
  grpo``): A_k = (r_k - mean_group) / (std_group + eps).
- The update is the token-level PPO clipped surrogate plus a k3 KL penalty
  to the frozen reference policy, compiled as ONE jitted step; per-token
  log-probs for the policy/old/ref all reuse the teacher-forcing
  ``forward_logits`` path, so the RL step costs the same as two CE steps.
"""

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cosyvoice_tpu.models.llm import LMConfig, TYPE_SPEECH
from cosyvoice_tpu.train.losses import IGNORE_ID
from cosyvoice_tpu.train.trainer import skip_nonfinite


@dataclass
class GRPOConfig:
    group_size: int = 8          # K rollouts per prompt (verl rollout.n)
    clip_eps: float = 0.2        # PPO ratio clip
    kl_coef: float = 1e-3        # weight of the k3 KL penalty to the ref policy
    min_len_mult: int = 2        # rollout min/max token length per text token,
    max_len_mult: int = 20       # same limits as inference (llm.py min/max_len)


# ---------------------------------------------------------------------------
# advantages
def grpo_advantages(rewards: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Group-relative advantages: rewards [B, K] -> [B, K], zero-mean/unit-std
    within each group of K rollouts of the same prompt."""
    rewards = np.asarray(rewards, np.float32)
    mean = rewards.mean(axis=-1, keepdims=True)
    std = rewards.std(axis=-1, keepdims=True)
    return (rewards - mean) / (std + eps)


# ---------------------------------------------------------------------------
# per-token log-probs (shared by policy / old / ref)
def _token_logps(logits: jax.Array, targets: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (logp [B, T], valid [B, T]); positions with IGNORE_ID get 0."""
    valid = targets != IGNORE_ID
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.where(valid, tok, 0.0), valid


def make_logps_fn(lm_module):
    """Jitted per-token log-prob of the rollout under given params (used to
    snapshot old/ref log-probs before the update)."""

    def fn(params, batch):
        logits = lm_module.apply(params, batch["ids"], batch["types"], batch["lengths"], method="forward_logits")
        lp, _ = _token_logps(logits, batch["targets"])
        return lp

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# the update step
def make_grpo_train_step(lm_module, optimizer, clip_eps: float = 0.2, kl_coef: float = 1e-3):
    """Returns jitted step(params, opt_state, batch, step) -> (params,
    opt_state, metrics).

    batch: ids/types/targets [B, T], lengths [B], old_logps/ref_logps [B, T],
    advantages [B] (the group dimension is flattened into B).
    """

    def loss_fn(params, batch):
        logits = lm_module.apply(params, batch["ids"], batch["types"], batch["lengths"], method="forward_logits")
        lp, valid = _token_logps(logits, batch["targets"])
        n_valid = jnp.maximum(jnp.sum(valid), 1)

        ratio = jnp.exp(lp - batch["old_logps"])
        adv = batch["advantages"][:, None]
        surr = jnp.minimum(ratio * adv, jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv)
        # k3 KL estimator (verl default): exp(ref-lp) - (ref-lp) - 1 >= 0
        d = batch["ref_logps"] - lp
        kl = jnp.exp(d) - d - 1.0
        per_tok = -surr + kl_coef * kl
        loss = jnp.sum(jnp.where(valid, per_tok, 0.0)) / n_valid  # token-mean
        clipfrac = jnp.sum(jnp.where(valid, (jnp.abs(ratio - 1.0) > clip_eps).astype(jnp.float32), 0.0)) / n_valid
        kl_mean = jnp.sum(jnp.where(valid, kl, 0.0)) / n_valid
        return loss, (kl_mean, clipfrac)

    def step_fn(params, opt_state, batch, step):
        (loss, (kl, clipfrac)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        updates, new_opt_state = skip_nonfinite(updates, new_opt_state, opt_state, finite)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "kl": kl, "clipfrac": clipfrac, "grad_norm": gnorm, "step": step + 1}
        return params, new_opt_state, metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# rollout + batch assembly (host side)
def sample_group(lm, params, ids: np.ndarray, types: np.ndarray, rng_key, cfg: GRPOConfig,
                 n_text: int) -> List[np.ndarray]:
    """K independent rollouts of one prompt from the current policy."""
    out = []
    for k in range(cfg.group_size):
        blocks = list(
            lm.generate(params, ids, types, jax.random.fold_in(rng_key, k),
                        int(n_text * cfg.min_len_mult), int(n_text * cfg.max_len_mult))
        )
        toks = np.concatenate(blocks) if blocks else np.zeros(0, np.int64)
        out.append(toks.astype(np.int32))
    return out


def build_grpo_batch(cfg: LMConfig, prompt_ids: np.ndarray, prompt_types: np.ndarray,
                     rollouts: Sequence[np.ndarray], pad_to: int = 8) -> dict:
    """ids/types/targets/lengths arrays [K, T] for one prompt's rollouts.

    Same target alignment as CE training (lm_data.build_lm_sample): the last
    prompt position targets the first rollout token, each rollout position
    targets the next, and the final one targets eos."""
    K = len(rollouts)
    P = len(prompt_ids)
    T = max(P + len(r) for r in rollouts)
    T = ((T + pad_to - 1) // pad_to) * pad_to
    ids = np.zeros((K, T), np.int32)
    types = np.full((K, T), TYPE_SPEECH, np.int32)
    targets = np.full((K, T), IGNORE_ID, np.int32)
    lengths = np.zeros(K, np.int32)
    for k, r in enumerate(rollouts):
        n = P + len(r)
        ids[k, :P] = prompt_ids
        types[k, :P] = prompt_types
        ids[k, P:n] = r
        if len(r):
            targets[k, P - 1] = r[0]
            targets[k, P : n - 1] = r[1:]
            targets[k, n - 1] = cfg.eos_token
        else:
            # immediate-eos rollout: the one action taken (eos at the prompt's
            # last position) must still carry its advantage, or degenerate
            # early stops can never be trained away
            targets[k, P - 1] = cfg.eos_token
        lengths[k] = n
    return {"ids": ids, "types": types, "targets": targets, "lengths": lengths}


# ---------------------------------------------------------------------------
# reward client matching the reference's token2wav+ASR server protocol
# (reward_tts.py:33-76: KServe v2 JSON with TOKENS / TOKEN_LENS / GT inputs,
# response outputs[0].data[0] = reward in [0, 1])
def http_reward(server_url: str) -> Callable[[np.ndarray, str], float]:
    import json
    import urllib.request

    def fn(tokens: np.ndarray, ground_truth: str) -> float:
        tokens = np.asarray(tokens, np.int32).reshape(1, -1)
        payload = {
            "inputs": [
                {"name": "TOKENS", "shape": list(tokens.shape), "datatype": "INT32",
                 "data": tokens.tolist()},
                {"name": "TOKEN_LENS", "shape": [1, 1], "datatype": "INT32",
                 "data": [[int(tokens.shape[1])]]},
                {"name": "GT", "shape": [1], "datatype": "BYTES", "data": [ground_truth]},
            ]
        }
        req = urllib.request.Request(server_url, json.dumps(payload).encode(),
                                     {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=200.0) as resp:
            out = json.loads(resp.read())
        return float(out["outputs"][0]["data"][0])

    return fn


# ---------------------------------------------------------------------------
# one full GRPO iteration over a list of prompts
def grpo_step(lm, params, opt_state, prompts: Sequence[dict], reward_fn, rng_key,
              cfg: GRPOConfig, train_step, logps_fn, ref_params, step: int,
              pad_to: int = 8):
    """prompts: [{'ids', 'types', 'n_text', 'ground_truth'}]. Samples K
    rollouts per prompt, scores them, and applies one policy update per
    prompt group. Returns (params, opt_state, metrics of last group)."""
    metrics = {}
    for i, p in enumerate(prompts):
        key = jax.random.fold_in(rng_key, i)
        rollouts = sample_group(lm, params, p["ids"], p["types"], key, cfg, p["n_text"])
        rewards = np.asarray([[reward_fn(r, p["ground_truth"]) for r in rollouts]], np.float32)
        adv = grpo_advantages(rewards)[0]
        batch = build_grpo_batch(lm.cfg, p["ids"], p["types"], rollouts, pad_to=pad_to)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["old_logps"] = logps_fn(params, batch)
        batch["ref_logps"] = logps_fn(ref_params, batch)
        batch["advantages"] = jnp.asarray(adv)
        params, opt_state, metrics = train_step(params, opt_state, batch, jnp.asarray(step))
    return params, opt_state, metrics
