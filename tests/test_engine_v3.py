import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.models.dit import DiTConfig
from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig
from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.runtime.engine import CosyVoice3Engine

K = jax.random.PRNGKey
CHUNK = 5


@pytest.fixture(scope="module")
def engine3():
    lm = Qwen2LM(
        LMConfig(
            speech_token_size=20,
            num_special_head=200,
            special_in_speech_table=True,
            block_size=CHUNK + 3,
            qwen=Qwen2Config(
                hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                intermediate_size=64, vocab_size=100, max_cache_len=256, dtype=jnp.float32,
            ),
        )
    )
    flow = CausalFlow(
        FlowConfig(
            input_size=80, vocab_size=50, chunk_size=CHUNK,
            encoder_type="dit_prelookahead", estimator_type="dit", dit_lookahead_channels=32,
            dit=DiTConfig(dim=32, depth=1, heads=2, dim_head=8, static_chunk_size=CHUNK * 2, freq_embed_dim=16),
            cfm=CFMConfig(n_timesteps=2),
        )
    )
    hift = HiFTGenerator(
        HiFTConfig(
            base_channels=32, causal=True,
            resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
            source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)),
        )
    )
    lm_params = lm.init(K(0))
    flow_params = flow.init(K(1))
    hift_params = hift.init(K(2), jnp.zeros((1, 12, 80)), K(3))
    return CosyVoice3Engine(
        lm, flow, hift, lm_params, flow_params, hift_params, token_hop_len=CHUNK, token_bucket=16, mel_bucket=8,
        flow_incr_min_tok=0,  # force the incremental path at test scales
    )


def v3_inputs(rng):
    return dict(
        text_tokens=rng.integers(0, 100, 6).astype(np.int32),
        prompt_text_tokens=rng.integers(0, 100, 3).astype(np.int32),
        llm_prompt_speech_token=rng.integers(0, 20, 4).astype(np.int32),
        flow_prompt_speech_token=rng.integers(0, 20, 4).astype(np.int32),
        prompt_speech_feat=rng.random((1, 8, 80)).astype(np.float32),
        flow_embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )


class TestEngineV3:
    def test_offline(self, engine3):
        rng = np.random.default_rng(0)
        out = list(engine3.tts(**v3_inputs(rng), stream=False, rng_seed=7))
        wav = out[0]["tts_speech"]
        assert wav.shape[0] == 1 and wav.shape[1] > 0
        assert np.isfinite(wav).all()

    def test_streaming_duration_matches_offline(self, engine3):
        rng = np.random.default_rng(0)
        inputs = v3_inputs(rng)
        off = list(engine3.tts(**inputs, stream=False, rng_seed=7))[0]["tts_speech"]
        chunks = [o["tts_speech"] for o in engine3.tts(**inputs, stream=True, rng_seed=7)]
        stream = np.concatenate(chunks, axis=1)
        assert stream.shape == off.shape

    @pytest.mark.slow
    def test_bucketed_cumulative_vocode_is_exact(self, engine3):
        """Non-finalize chunks pad the cumulative mel to mel_bucket and slice
        the wav back: the emitted samples must be IDENTICAL to the
        exact-length re-vocode (prefix stability of the causal vocoder)."""
        from cosyvoice_tpu.runtime.engine import CosyVoice3Engine

        rng = np.random.default_rng(2)
        inputs = v3_inputs(rng)
        src = rng.integers(0, 20, 18).astype(np.int32)
        exact_eng = CosyVoice3Engine(
            engine3.lm, engine3.flow, engine3.hift,
            engine3.lm_params, engine3.flow_params, engine3.hift_params,
            token_hop_len=CHUNK, token_bucket=16, mel_bucket=1,
        )
        bucketed = [o["tts_speech"] for o in engine3.tts(**inputs, stream=True, source_speech_token=src)]
        exact = [o["tts_speech"] for o in exact_eng.tts(**inputs, stream=True, source_speech_token=src)]
        assert len(bucketed) == len(exact)
        for i, (b, e) in enumerate(zip(bucketed, exact)):
            assert b.shape == e.shape, f"chunk {i}: {b.shape} vs {e.shape}"
            scale = max(np.abs(e).max(), 1e-6)
            assert np.abs(b - e).max() / scale < 1e-5, f"chunk {i}"

    def test_squelch_drops_long_silent_runs(self, engine3):
        gen = iter([np.asarray([1] * 10 + [5], np.int32)])
        out = np.concatenate(list(engine3._squelch(gen)))
        # token 1 is a silent token: only max_silent=5 of 10 survive
        assert (out == 1).sum() == 5 and out[-1] == 5


class TestV3IncrementalFlow:
    def test_incremental_matches_recompute(self, engine3):
        """v3 streaming with the incremental DiT flow (carried KV arenas)
        must produce the same chunks as the full-prefix recompute."""
        rng = np.random.default_rng(5)
        inputs = v3_inputs(rng)
        assert engine3.incremental_flow
        incr = [o["tts_speech"] for o in engine3.tts(**inputs, stream=True, rng_seed=13)]

        rec = CosyVoice3Engine(
            engine3.lm, engine3.flow, engine3.hift,
            engine3.lm_params, engine3.flow_params, engine3.hift_params,
            token_hop_len=CHUNK, token_bucket=16, mel_bucket=8,
            incremental_flow=False,
        )
        ref = [o["tts_speech"] for o in rec.tts(**inputs, stream=True, rng_seed=13)]
        assert len(incr) == len(ref)
        for i, (a, b) in enumerate(zip(incr, ref)):
            assert a.shape == b.shape, f"chunk {i}: {a.shape} vs {b.shape}"
            scale = max(np.abs(np.asarray(b)).max(), 1e-6)
            diff = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
            assert diff < 2e-3, f"chunk {i}: rel diff {diff}"
