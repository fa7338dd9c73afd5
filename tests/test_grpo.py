"""GRPO recipe tests (reference examples/grpo/cosyvoice2: verl
adv_estimator=grpo + reward_tts.py custom reward)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, TYPE_SPECIAL, TYPE_TEXT
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.train.grpo import (
    GRPOConfig,
    build_grpo_batch,
    grpo_advantages,
    grpo_step,
    make_grpo_train_step,
    make_logps_fn,
    sample_group,
)
from cosyvoice_tpu.train.losses import IGNORE_ID

K = jax.random.PRNGKey


def tiny_lm():
    return Qwen2LM(
        LMConfig(
            speech_token_size=20,
            block_size=8,
            qwen=Qwen2Config(
                hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                intermediate_size=64, vocab_size=100, max_cache_len=128, dtype=jnp.float32,
            ),
        )
    )


def make_prompt(cfg, n_text=4):
    rng = np.random.default_rng(0)
    tt = rng.integers(0, 50, n_text).astype(np.int32)
    ids = np.concatenate([[cfg.sos_id], tt, [cfg.task_id]]).astype(np.int32)
    types = np.concatenate([[TYPE_SPECIAL], np.full(n_text, TYPE_TEXT), [TYPE_SPECIAL]]).astype(np.int32)
    return {"ids": ids, "types": types, "n_text": n_text, "ground_truth": "gt"}


class TestGRPOAlgorithm:
    def test_advantages_group_normalized(self):
        r = np.array([[1.0, 0.0, 0.5, 0.5], [0.2, 0.2, 0.8, 0.8]], np.float32)
        a = grpo_advantages(r)
        assert a.shape == r.shape
        np.testing.assert_allclose(a.mean(axis=1), 0.0, atol=1e-6)
        np.testing.assert_allclose(a.std(axis=1), 1.0, atol=1e-3)
        # better-than-group rollouts get positive advantage
        assert a[0, 0] > 0 and a[0, 1] < 0

    def test_advantages_constant_group_is_zero(self):
        a = grpo_advantages(np.full((1, 4), 0.7, np.float32))
        np.testing.assert_allclose(a, 0.0, atol=1e-4)

    def test_batch_target_alignment(self):
        cfg = LMConfig(speech_token_size=20)
        prompt = make_prompt(cfg)
        rollouts = [np.array([3, 4, 5], np.int32), np.array([7], np.int32)]
        b = build_grpo_batch(cfg, prompt["ids"], prompt["types"], rollouts, pad_to=4)
        P = len(prompt["ids"])
        # last prompt position predicts the first rollout token
        assert b["targets"][0, P - 1] == 3
        assert list(b["targets"][0, P : P + 3]) == [4, 5, cfg.eos_token]
        assert (b["targets"][0, : P - 1] == IGNORE_ID).all()
        assert b["lengths"][0] == P + 3 and b["lengths"][1] == P + 1
        assert b["targets"][1, P - 1] == 7 and b["targets"][1, P] == cfg.eos_token


class TestGRPOTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        lm = tiny_lm()
        params = lm.init(K(0))
        # pin stop rows off: v2 semantics keep non-EOS stop rows samplable
        # pre-min_len, so random-init rollouts can legally come back empty —
        # these tests exercise the GRPO math, not the sampler's coin flip
        bias = params["params"]["llm_decoder"]["bias"]
        params["params"]["llm_decoder"]["bias"] = bias.at[lm.cfg.speech_token_size:].set(-30.0)
        optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
        return lm, params, optimizer

    def test_step_ratio_one_at_start(self, setup):
        """old == current policy -> ratio 1, clipfrac 0, loss = -mean(adv)."""
        lm, params, optimizer = setup
        cfg = GRPOConfig(group_size=2, kl_coef=0.0)
        prompt = make_prompt(lm.cfg)
        rollouts = sample_group(lm, params, prompt["ids"], prompt["types"], K(1), cfg, prompt["n_text"])
        assert len(rollouts) == 2 and all(len(r) > 0 for r in rollouts)
        batch = build_grpo_batch(lm.cfg, prompt["ids"], prompt["types"], rollouts)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        logps_fn = make_logps_fn(lm.module)
        batch["old_logps"] = logps_fn(params, batch)
        batch["ref_logps"] = batch["old_logps"]
        adv = np.array([1.0, -1.0], np.float32)
        batch["advantages"] = jnp.asarray(adv)

        step = make_grpo_train_step(lm.module, optimizer, clip_eps=0.2, kl_coef=0.0)
        opt_state = optimizer.init(params)
        # the step donates its params/opt_state buffers; keep the fixture's
        params_in = jax.tree_util.tree_map(jnp.copy, params)
        new_params, _, m = step(params_in, opt_state, batch, jnp.asarray(0))
        assert float(m["clipfrac"]) == 0.0
        assert abs(float(m["kl"])) < 1e-5
        # token-mean of -adv: n0 tokens at -1, n1 tokens at +1
        n0 = len(rollouts[0]) + 1
        n1 = len(rollouts[1]) + 1
        expected = -(n0 * 1.0 + n1 * -1.0) / (n0 + n1)
        assert abs(float(m["loss"]) - expected) < 1e-4
        # params moved
        moved = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()),
            jax.tree_util.tree_map(lambda a, b: a - b, new_params, params), 0.0)
        assert moved > 0

    def test_full_grpo_step_improves_reward_signal(self, setup):
        """End-to-end: rollouts + reward + update; KL to ref stays finite and
        the policy's logp of high-reward rollouts increases."""
        lm, params, optimizer = setup
        cfg = GRPOConfig(group_size=4, kl_coef=1e-3)
        prompt = make_prompt(lm.cfg)
        opt_state = optimizer.init(params)
        train_step = make_grpo_train_step(lm.module, optimizer, cfg.clip_eps, cfg.kl_coef)
        logps_fn = make_logps_fn(lm.module)

        def reward_fn(tokens, gt):  # prefer low token ids
            return float((np.asarray(tokens) < 10).mean()) if len(tokens) else 0.0

        rollouts = sample_group(lm, params, prompt["ids"], prompt["types"], K(2), cfg, prompt["n_text"])
        rewards = np.asarray([[reward_fn(r, "gt") for r in rollouts]], np.float32)
        batch = build_grpo_batch(lm.cfg, prompt["ids"], prompt["types"], rollouts)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["old_logps"] = logps_fn(params, batch)
        batch["ref_logps"] = batch["old_logps"]
        batch["advantages"] = jnp.asarray(grpo_advantages(rewards)[0])
        lp_before = logps_fn(params, batch)

        params_in = jax.tree_util.tree_map(jnp.copy, params)
        new_params, opt_state, m = train_step(params_in, opt_state, batch, jnp.asarray(0))
        assert np.isfinite(float(m["loss"])) and float(m["grad_norm"]) > 0
        lp_after = logps_fn(new_params, batch)
        valid = np.asarray(batch["targets"]) != IGNORE_ID
        adv = np.asarray(batch["advantages"])
        if (adv > 0).any() and (adv < 0).any():
            d = (np.asarray(lp_after) - np.asarray(lp_before))
            seq_d = np.array([d[i][valid[i]].mean() for i in range(len(adv))])
            # positive-advantage rollouts gained probability relative to
            # negative-advantage ones
            assert seq_d[adv > 0].mean() > seq_d[adv < 0].mean()

    def test_grpo_step_driver(self, setup):
        """grpo_step orchestrator runs a full iteration on two prompts."""
        lm, params, optimizer = setup
        cfg = GRPOConfig(group_size=2)
        opt_state = optimizer.init(params)
        train_step = make_grpo_train_step(lm.module, optimizer, cfg.clip_eps, cfg.kl_coef)
        logps_fn = make_logps_fn(lm.module)
        prompts = [make_prompt(lm.cfg, 4), make_prompt(lm.cfg, 4)]
        params_in = jax.tree_util.tree_map(jnp.copy, params)
        params2, opt_state, m = grpo_step(
            lm, params_in, opt_state, prompts, lambda t, g: float(len(t) % 3) / 2.0,
            K(3), cfg, train_step, logps_fn, params, 0,
        )
        assert np.isfinite(float(m["loss"]))
        assert int(m["step"]) == 1
