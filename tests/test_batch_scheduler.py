"""Continuous-batching LM scheduler tests (the vLLM-role component:
reference runtime/triton_trtllm serving stack)."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.runtime.batch_scheduler import LMBatchScheduler

K = jax.random.PRNGKey


@pytest.fixture(scope="module")
def lm_and_params():
    lm = Qwen2LM(
        LMConfig(
            speech_token_size=20,
            block_size=8,
            qwen=Qwen2Config(
                hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                intermediate_size=64, vocab_size=100, max_cache_len=256, dtype=jnp.float32,
            ),
        )
    )
    return lm, lm.init(K(0))


def make_prompt(cfg, seed=0, n_text=4, n_speech=3):
    rng = np.random.default_rng(seed)
    tt = rng.integers(0, 50, n_text).astype(np.int32)
    st = rng.integers(0, 20, n_speech).astype(np.int32)
    ids = np.concatenate([[cfg.sos_id], tt, [cfg.task_id], st]).astype(np.int32)
    types = np.concatenate(
        [[TYPE_SPECIAL], np.full(n_text, TYPE_TEXT), [TYPE_SPECIAL], np.full(n_speech, TYPE_SPEECH)]
    ).astype(np.int32)
    return ids, types


class TestRaggedDecode:
    def test_ragged_decode_matches_teacher_forcing(self, lm_and_params):
        """Rows with DIFFERENT sequence lengths decoded together must match
        the teacher-forced forward at each row's own position — this is what
        the uniform decode_step (cur_len[0] rope/write) gets wrong and the
        scheduler relies on."""
        lm, params = lm_and_params
        rng = np.random.default_rng(5)
        lens = [7, 12]
        n_steps = 4
        T_full = max(lens) + n_steps
        full_ids = rng.integers(0, 20, (2, T_full)).astype(np.int32)
        full_types = np.full((2, T_full), TYPE_SPEECH, np.int32)
        lengths = np.array([l + n_steps for l in lens], np.int32)
        fwd = lm.module.apply(params, jnp.asarray(full_ids), jnp.asarray(full_types),
                              jnp.asarray(lengths), method="forward_logits")
        fwd = np.asarray(fwd)

        pad = 16
        ids = np.zeros((2, pad), np.int32)
        types = np.full((2, pad), TYPE_SPEECH, np.int32)
        for b, L in enumerate(lens):
            ids[b, :L] = full_ids[b, :L]
        cache = lm.init_cache(2)
        logits, cache = lm.module.apply(params, jnp.asarray(ids), jnp.asarray(types),
                                        jnp.asarray(lens), cache, method="prefill")
        for b, L in enumerate(lens):
            np.testing.assert_allclose(np.asarray(logits)[b], fwd[b, L - 1], atol=2e-3, rtol=1e-3)

        for s in range(n_steps):
            tok = jnp.asarray([full_ids[b, lens[b] + s] for b in range(2)])
            cur = jnp.asarray([lens[b] + s for b in range(2)], jnp.int32)
            logits, cache = lm.module.apply(params, tok, cur, cache, method="decode_step_ragged")
            for b, L in enumerate(lens):
                np.testing.assert_allclose(
                    np.asarray(logits)[b], fwd[b, L + s], atol=2e-3, rtol=1e-3,
                    err_msg=f"row {b} step {s}",
                )


class TestBatchScheduler:
    def test_single_session_matches_generate(self, lm_and_params):
        """A lone session in the batched arena must produce the exact token
        stream of the single-session path (same rng discipline: split per
        block, fold by slot index)."""
        lm, params = lm_and_params
        ids, types = make_prompt(lm.cfg)
        ref = np.concatenate(list(lm.generate(params, ids, types, K(7), 8, 40)) or [np.zeros(0, np.int64)])

        sched = LMBatchScheduler(lm, params, max_batch=4, seed=0)
        sched.rng = K(7)  # align the rng stream with the generate call
        h = sched.submit(ids, types, 8, 40)
        while sched.step() or sched.n_active:
            pass
        got = np.concatenate([b for b in h] or [np.zeros(0, np.int64)])
        np.testing.assert_array_equal(got, ref)

    def test_concurrent_sessions_and_slot_reuse(self, lm_and_params):
        lm, params = lm_and_params
        sched = LMBatchScheduler(lm, params, max_batch=2, seed=1)
        # 3 sessions on 2 slots: the third must wait for a free slot
        handles = [
            sched.submit(*make_prompt(lm.cfg, seed=s, n_text=3 + s), 4, 20) for s in range(3)
        ]
        results = [[] for _ in handles]

        def drain(i):
            for block in handles[i]:
                results[i].append(block)

        threads = [threading.Thread(target=drain, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for _ in range(200):
            if not (sched.step() or sched.n_active or not sched.pending.empty()):
                break
        for t in threads:
            t.join(timeout=10)
        for i, res in enumerate(results):
            toks = np.concatenate(res) if res else np.zeros(0)
            assert 0 < len(toks) <= 20, f"session {i}: {len(toks)} tokens"
            assert (toks < lm.cfg.speech_token_size).all()

    def test_background_thread_mode(self, lm_and_params):
        lm, params = lm_and_params
        sched = LMBatchScheduler(lm, params, max_batch=2, seed=2)
        sched.start()
        try:
            hs = [sched.submit(*make_prompt(lm.cfg, seed=10 + s), 4, 16) for s in range(2)]
            outs = [np.concatenate(list(h) or [np.zeros(0)]) for h in hs]
            for o in outs:
                assert 0 < len(o) <= 16
            # late submission after the first wave (slot reuse through the thread)
            h3 = sched.submit(*make_prompt(lm.cfg, seed=30), 4, 16)
            o3 = np.concatenate(list(h3) or [np.zeros(0)])
            assert 0 < len(o3) <= 16
        finally:
            sched.stop()

    def test_engine_tts_with_scheduler(self, lm_and_params):
        """engine.tts routes its LM pull through the shared scheduler and
        still produces duration-consistent streaming audio."""
        from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
        from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig
        from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
        from cosyvoice_tpu.runtime.engine import CosyVoice2Engine

        lm, params = lm_and_params
        flow = CausalFlow(
            FlowConfig(
                input_size=32, vocab_size=50, chunk_size=5, attention_heads=2, linear_units=64,
                num_blocks=1, num_up_blocks=1,
                estimator=EstimatorConfig(channels=(32,), attention_head_dim=8, n_blocks=1,
                                          num_mid_blocks=1, num_heads=2, static_chunk_size=10, causal=True),
                cfm=CFMConfig(n_timesteps=2),
            )
        )
        hift = HiFTGenerator(
            HiFTConfig(base_channels=32, resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
                       source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)))
        )
        flow_params = flow.init(K(1))
        hift_params = hift.init(K(2), jnp.zeros((1, 8, 80)), K(3))
        eng = CosyVoice2Engine(lm, flow, hift, params, flow_params, hift_params,
                               token_hop_len=5, token_bucket=16, mel_bucket=8)
        sched = LMBatchScheduler(lm, params, max_batch=2, seed=3)
        sched.start()
        eng.scheduler = sched
        try:
            rng = np.random.default_rng(0)
            chunks = list(
                eng.tts(
                    text_tokens=rng.integers(0, 50, 6).astype(np.int32),
                    prompt_text_tokens=rng.integers(0, 50, 3).astype(np.int32),
                    llm_prompt_speech_token=rng.integers(0, 20, 4).astype(np.int32),
                    flow_prompt_speech_token=rng.integers(0, 20, 4).astype(np.int32),
                    prompt_speech_feat=rng.random((1, 8, 80)).astype(np.float32),
                    flow_embedding=rng.standard_normal((1, 192)).astype(np.float32),
                    stream=True,
                )
            )
            wav = np.concatenate([c["tts_speech"] for c in chunks], axis=1)
            assert wav.shape[1] % 480 == 0 and wav.shape[1] > 0
            assert np.isfinite(wav).all()
        finally:
            sched.stop()


class TestParallelSegments:
    @pytest.mark.slow
    def test_offline_multi_segment_runs_concurrently(self):
        """With continuous batching on, multi-segment offline synthesis yields
        one chunk per segment, in order (api._run_segments parallel path)."""
        from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
        from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig
        from cosyvoice_tpu.models.hift import HiFTConfig
        from cosyvoice_tpu.runtime.api import CosyVoice2

        model = CosyVoice2(
            # speech_token_size must cover the S3 tokenizer's 0..6560 id
            # range the frontend emits for the prompt audio
            lm_cfg=LMConfig(
                speech_token_size=6561, block_size=8,
                qwen=Qwen2Config(hidden_size=32, num_layers=1, num_heads=2, num_kv_heads=1, head_dim=16,
                                 intermediate_size=64, vocab_size=160000, max_cache_len=512,
                                 dtype=jnp.float32),
            ),
            flow_cfg=FlowConfig(
                input_size=32, attention_heads=2, linear_units=64, num_blocks=1,
                num_up_blocks=1,
                estimator=EstimatorConfig(channels=(32,), attention_head_dim=8, n_blocks=1,
                                          num_mid_blocks=1, num_heads=2),
                cfm=CFMConfig(n_timesteps=1),
            ),
            hift_cfg=HiFTConfig(base_channels=32, resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
                                source_resblock_kernel_sizes=(7, 7, 11),
                                source_resblock_dilations=((1,), (1,), (1,))),
        )
        sched = model.enable_continuous_batching(max_batch=2)
        try:
            long_text = ("This is a rather long sentence that keeps going for quite a while. " * 6).strip()
            segs = model.frontend.text_normalize(long_text, split=True)
            assert len(segs) >= 2, segs
            prompt = np.random.RandomState(0).randn(1, 8000).astype(np.float32) * 0.05
            outs = list(model.inference_zero_shot(long_text, "prompt text", prompt))
            assert len(outs) == len(segs)
            for o in outs:
                assert o["tts_speech"].shape[1] > 0
                assert np.isfinite(o["tts_speech"]).all()
        finally:
            sched.stop()
