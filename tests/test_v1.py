import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig
from cosyvoice_tpu.models.flow_v1 import FlowV1Config, MaskedDiffFlow
from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
from cosyvoice_tpu.models.llm_v1 import LMv1Config, TransformerLM
from cosyvoice_tpu.runtime.engine import CosyVoiceV1Engine

K = jax.random.PRNGKey


def tiny_lm_cfg():
    return LMv1Config(
        text_encoder_input_size=16,
        llm_input_size=32,
        llm_output_size=32,
        text_token_size=100,
        speech_token_size=30,
        te_heads=2, te_linear_units=32, te_blocks=1,
        lm_heads=2, lm_linear_units=32, lm_blocks=2,
        max_cache_len=256,
        block_size=8,
    )


@pytest.fixture(scope="module")
def v1_lm():
    lm = TransformerLM(tiny_lm_cfg())
    return lm, lm.init(K(0))


@pytest.fixture(scope="module")
def v1_flow():
    cfg = FlowV1Config(
        input_size=16, vocab_size=30, attention_heads=2, linear_units=32, num_blocks=1,
        regulator_ratios=(1,),
        estimator=EstimatorConfig(channels=(16, 16), attention_head_dim=8, n_blocks=1,
                                  num_mid_blocks=1, num_heads=2, causal=False),
        cfm=CFMConfig(n_timesteps=2),
    )
    flow = MaskedDiffFlow(cfg)
    return flow, flow.init(K(1))


class TestTransformerLM:
    def test_generate(self, v1_lm):
        lm, params = v1_lm
        text = np.arange(6, dtype=np.int32)
        spk = np.zeros((1, 192), np.float32)
        pst = np.asarray([1, 2, 3], np.int32)
        toks = []
        for b in lm.generate(params, text, spk, pst, K(3), min_len=6, max_len=20):
            toks.extend(b.tolist())
        assert 6 <= len(toks) <= 20
        assert all(0 <= t < 30 for t in toks)

    def test_prefill_matches_stepwise(self, v1_lm):
        """Arena rel-pos decode must equal a longer prefill's last logits."""
        lm, params = v1_lm
        text = np.arange(4, dtype=np.int32)
        spk = np.zeros((1, 192), np.float32)
        pst = np.asarray([5, 6], np.int32)
        bucket = 32
        tp = np.zeros((1, bucket), np.int32); tp[0, :4] = text
        pp = np.zeros((1, bucket), np.int32); pp[0, :2] = pst

        k, v = lm.init_cache(1)
        logits, k, v, total = lm._jit_prepare(
            params, jnp.asarray(tp), jnp.asarray([4]), jnp.asarray(spk), jnp.asarray(pp), jnp.asarray([2]), k, v
        )
        # step with token 7, compare vs prefill with prompt speech [5, 6, 7]
        step_logits, k, v = lm.module.apply(params, jnp.asarray([7]), total, k, v, method="lm_step")

        pp2 = np.zeros((1, bucket), np.int32); pp2[0, :3] = [5, 6, 7]
        k2, v2 = lm.init_cache(1)
        ref_logits, _, _, _ = lm._jit_prepare(
            params, jnp.asarray(tp), jnp.asarray([4]), jnp.asarray(spk), jnp.asarray(pp2), jnp.asarray([3]), k2, v2
        )
        np.testing.assert_allclose(np.asarray(step_logits), np.asarray(ref_logits), atol=2e-4)


class TestMaskedDiffFlow:
    def test_inference_and_cache(self, v1_flow):
        flow, params = v1_flow
        tok = jnp.asarray(np.random.default_rng(0).integers(0, 30, (1, 10)), jnp.int32)
        pf = jnp.asarray(np.random.default_rng(1).random((1, 7, 80)), jnp.float32)
        emb = jnp.asarray(np.random.default_rng(2).standard_normal((1, 192)), jnp.float32)
        mel, cache = flow.inference(params, K(0), tok, 4, pf, emb)
        # 6 target tokens at 50 Hz -> int(6/50*22050/256) = 10 frames
        assert mel.shape == (1, flow.cfg.mel_len(6), 80)
        total = 7 + flow.cfg.mel_len(6)
        assert cache[0].shape[1] == 7 + min(flow.cfg.overlap_mel, total)
        # next chunk is larger (hop grows), so cache fits inside the new T
        tok2 = jnp.asarray(np.random.default_rng(5).integers(0, 30, (1, 24)), jnp.int32)
        mel2, _ = flow.inference(params, K(1), tok2, 4, pf, emb, cache=cache)
        assert mel2.shape == (1, flow.cfg.mel_len(20), 80)

    def test_loss(self, v1_flow):
        flow, params = v1_flow
        rng = np.random.default_rng(3)
        tok = jnp.asarray(rng.integers(0, 30, (2, 8)), jnp.int32)
        feat = jnp.asarray(rng.standard_normal((2, 13, 80)), jnp.float32)
        emb = jnp.asarray(rng.standard_normal((2, 192)), jnp.float32)
        loss = flow.loss(params, K(0), tok, jnp.asarray([8, 6]), feat, jnp.asarray([13, 10]), emb)
        assert np.isfinite(float(loss))


class TestV1Engine:
    @pytest.mark.slow
    def test_offline_and_streaming(self, v1_lm, v1_flow):
        lm, lm_params = v1_lm
        flow, flow_params = v1_flow
        hift = HiFTGenerator(
            HiFTConfig(
                base_channels=32, sampling_rate=22050,
                upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
                resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
                source_resblock_kernel_sizes=(7, 11), source_resblock_dilations=((1,), (1,)),
            )
        )
        hift_params = hift.init(K(2), jnp.zeros((1, 8, 80)), K(3))
        eng = CosyVoiceV1Engine(lm, flow, hift, lm_params, flow_params, hift_params)
        # tiny hops for testing; caches scaled down consistently
        eng.token_min_hop_len, eng.token_max_hop_len, eng.token_overlap_len = 6, 12, 4
        eng.mel_overlap_len = 4
        eng.mel_window = np.hamming(8)
        eng.mel_cache_len = 4
        eng.source_cache_len = 4 * eng.wav_hop
        eng.speech_window = np.hamming(2 * eng.source_cache_len)

        rng = np.random.default_rng(0)
        inputs = dict(
            text_tokens=rng.integers(0, 100, 5).astype(np.int32),
            prompt_text_tokens=rng.integers(0, 100, 2).astype(np.int32),
            llm_prompt_speech_token=rng.integers(0, 30, 3).astype(np.int32),
            flow_prompt_speech_token=rng.integers(0, 30, 3).astype(np.int32),
            prompt_speech_feat=rng.random((1, 5, 80)).astype(np.float32),
            flow_embedding=rng.standard_normal((1, 192)).astype(np.float32),
        )
        off = list(eng.tts(**inputs, stream=False, rng_seed=3))
        assert off[0]["tts_speech"].shape[1] > 0
        chunks = [o["tts_speech"] for o in eng.tts(**inputs, stream=True, rng_seed=3)]
        assert len(chunks) >= 1
        assert np.isfinite(np.concatenate(chunks, axis=1)).all()


class TestV1Training:
    def test_forward_logits_matches_prefill(self, v1_lm):
        """Teacher-forcing training logits at the final position must equal the
        inference prefill's next-token logits over the same prefix."""
        lm, params = v1_lm
        text = jnp.asarray([[3, 4, 5, 6, 0, 0]], jnp.int32)
        tl = jnp.asarray([4])
        spk = jax.random.normal(K(2), (1, 192))
        speech = jnp.asarray([[7, 8, 9, 0]], jnp.int32)
        sl = jnp.asarray([3])

        logits_all, total = lm.module.apply(params, text, tl, spk, speech, sl, method="forward_logits")
        k, v = lm.init_cache(1)
        prefill_logits, _, _, total2 = lm.module.apply(params, text, tl, spk, speech, sl, k, v, method="prepare")
        assert int(total[0]) == int(total2[0]) == 3 + 4 + 3
        last = logits_all[0, int(total[0]) - 1]
        np.testing.assert_allclose(np.asarray(last), np.asarray(prefill_logits[0]), rtol=1e-4, atol=1e-4)

    def test_v1_targets_alignment(self):
        from cosyvoice_tpu.train.trainer import v1_lm_targets
        from cosyvoice_tpu.train.losses import IGNORE_ID

        speech = jnp.asarray([[7, 8, 9, 0]], jnp.int32)
        tgt = np.asarray(v1_lm_targets(30, 6, jnp.asarray([4]), speech, jnp.asarray([3])))
        S = 3 + 6 + 4
        assert tgt.shape == (1, S)
        # positions 0..5 = sos,spk,text(4); task at 2+4=6 predicts speech[0]
        assert (tgt[0, :6] == IGNORE_ID).all()
        assert tgt[0, 6] == 7 and tgt[0, 7] == 8 and tgt[0, 8] == 9
        assert tgt[0, 9] == 30  # eos
        assert (tgt[0, 10:] == IGNORE_ID).all()

    def test_v1_lm_train_step_reduces_loss(self, v1_lm):
        import optax
        from cosyvoice_tpu.train.trainer import make_lm_v1_train_step

        lm, params = v1_lm
        opt = optax.adam(1e-3)
        step = make_lm_v1_train_step(lm.module, opt, lm.cfg.speech_token_size)
        batch = {
            "text": jnp.asarray([[3, 4, 5, 6, 0, 0], [1, 2, 0, 0, 0, 0]], jnp.int32),
            "text_len": jnp.asarray([4, 2]),
            "spk": jax.random.normal(K(3), (2, 192)),
            "speech": jnp.asarray([[7, 8, 9, 0], [5, 6, 0, 0]], jnp.int32),
            "speech_len": jnp.asarray([3, 2]),
        }
        p = jax.tree_util.tree_map(lambda x: x, params)
        state = opt.init(p)
        losses = []
        for i in range(8):
            p, state, m = step(p, state, batch, i)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
