import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig
from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.runtime.engine import CosyVoice2Engine

K = jax.random.PRNGKey
CHUNK = 5


@pytest.fixture(scope="module")
def engine():
    lm = Qwen2LM(
        LMConfig(
            speech_token_size=20,
            block_size=CHUNK + 3,
            qwen=Qwen2Config(
                hidden_size=32,
                num_layers=2,
                num_heads=4,
                num_kv_heads=2,
                head_dim=8,
                intermediate_size=64,
                vocab_size=100,
                max_cache_len=256,
                dtype=jnp.float32,
            ),
        )
    )
    flow = CausalFlow(
        FlowConfig(
            input_size=32,
            vocab_size=50,
            chunk_size=CHUNK,
            attention_heads=2,
            linear_units=64,
            num_blocks=1,
            num_up_blocks=1,
            estimator=EstimatorConfig(
                channels=(32,), attention_head_dim=8, n_blocks=1, num_mid_blocks=1, num_heads=2,
                static_chunk_size=CHUNK * 2, causal=True,
            ),
            cfm=CFMConfig(n_timesteps=2),
        )
    )
    hift = HiFTGenerator(
        HiFTConfig(
            base_channels=32,
            resblock_kernel_sizes=(3,),
            resblock_dilations=((1,),),
            source_resblock_kernel_sizes=(7, 7, 11),
            source_resblock_dilations=((1,), (1,), (1,)),
        )
    )
    lm_params = lm.init(K(0))
    flow_params = flow.init(K(1))
    mel0 = jnp.zeros((1, 8, 80))
    hift_params = hift.init(K(2), mel0, K(3))
    eng = CosyVoice2Engine(
        lm, flow, hift, lm_params, flow_params, hift_params, token_hop_len=CHUNK, token_bucket=16, mel_bucket=8,
        flow_incr_min_tok=0,  # force the incremental path at test scales
    )
    return eng


def prompt_inputs(rng):
    return dict(
        text_tokens=rng.integers(0, 100, 6).astype(np.int32),
        prompt_text_tokens=rng.integers(0, 100, 3).astype(np.int32),
        llm_prompt_speech_token=rng.integers(0, 20, 4).astype(np.int32),
        flow_prompt_speech_token=rng.integers(0, 20, 4).astype(np.int32),
        prompt_speech_feat=rng.random((1, 8, 80)).astype(np.float32),
        flow_embedding=rng.standard_normal((1, 192)).astype(np.float32),
    )


class TestEngine:
    def test_offline_tts(self, engine):
        rng = np.random.default_rng(0)
        out = list(engine.tts(**prompt_inputs(rng), stream=False, rng_seed=7))
        assert len(out) == 1
        wav = out[0]["tts_speech"]
        assert wav.shape[0] == 1 and wav.shape[1] % 480 == 0 and wav.shape[1] > 0
        assert np.isfinite(wav).all()

    def test_streaming_matches_offline_duration(self, engine):
        rng = np.random.default_rng(0)
        inputs = prompt_inputs(rng)
        off = list(engine.tts(**inputs, stream=False, rng_seed=7))[0]["tts_speech"]
        chunks = [o["tts_speech"] for o in engine.tts(**inputs, stream=True, rng_seed=7)]
        stream_wav = np.concatenate(chunks, axis=1)
        assert stream_wav.shape == off.shape  # same tokens -> same total duration
        assert len(chunks) >= 2

    def test_fused_stream_matches_host_path(self, engine):
        """The single-program streaming chunk (flow+slice+HiFT caches+vocode+
        fade fused, caches device-resident) must agree with the host-side
        multi-call path chunk for chunk. The host path is run with
        mel_bucket=1 (no vocoder padding) so both paths compute the exact
        same math — the fused path never pads the vocoder input, while the
        default host path pads to mel_bucket with log-silence (which the
        HiFT's non-causal convs see near the chunk tail)."""
        rng = np.random.default_rng(3)
        inputs = prompt_inputs(rng)
        assert engine.fused_stream
        fused = [o["tts_speech"] for o in engine.tts(**inputs, stream=True, rng_seed=11)]
        host_eng = CosyVoice2Engine(
            engine.lm, engine.flow, engine.hift,
            engine.lm_params, engine.flow_params, engine.hift_params,
            token_hop_len=CHUNK, token_bucket=16, mel_bucket=1,
        )
        host_eng.fused_stream = False
        host = [o["tts_speech"] for o in host_eng.tts(**inputs, stream=True, rng_seed=11)]
        assert len(fused) == len(host)
        # all non-final chunks are exactly the same computation
        for i, (f, h) in enumerate(zip(fused[:-1], host[:-1])):
            assert f.shape == h.shape, f"chunk {i}: {f.shape} vs {h.shape}"
            scale = max(np.abs(h).max(), 1e-6)
            diff = np.abs(np.asarray(f) - h).max() / scale
            assert diff < 2e-3, f"chunk {i}: rel diff {diff}"
        # the finalize chunk goes through the host path in both engines, but
        # with different mel_buckets (8 vs 1) -> tail padding differences
        assert fused[-1].shape == host[-1].shape
        assert np.isfinite(np.asarray(fused[-1])).all()

    def test_fused_finalize_matches_host_path(self, engine):
        """The single-program finalize chunk (recompute flow + cache splice +
        vocode + fade fused) must match the host-side _flow_chunk + _vocode +
        _fade path, INCLUDING the vocoder bucket pad (the non-causal HiFT
        sees the log-silence pad rows near the tail, so the fused program
        pads to exactly the host _vocode bucket)."""
        rng = np.random.default_rng(6)
        inputs = prompt_inputs(rng)
        engines = []
        for disable in (False, True):
            e = CosyVoice2Engine(
                engine.lm, engine.flow, engine.hift,
                engine.lm_params, engine.flow_params, engine.hift_params,
                token_hop_len=CHUNK, token_bucket=16, mel_bucket=8,
            )
            e.speculative_first_chunk = False
            e._disable_fused_final = disable
            engines.append(e)
        a = [o["tts_speech"] for o in engines[0].tts(**inputs, stream=True, rng_seed=11)]
        b = [o["tts_speech"] for o in engines[1].tts(**inputs, stream=True, rng_seed=11)]
        assert len(a) == len(b) and len(a) >= 2
        for i, (x, y) in enumerate(zip(a, b)):
            assert x.shape == y.shape, f"chunk {i}: {x.shape} vs {y.shape}"
            scale = max(np.abs(np.asarray(y)).max(), 1e-6)
            diff = np.abs(np.asarray(x) - np.asarray(y)).max() / scale
            assert diff < 1e-3, f"chunk {i}: rel diff {diff}"

    def test_prompt_length_shares_one_program(self, engine):
        """prompt_mel_len is traced (roll+mask, not a static slice): a serving
        mix of different prompt lengths must NOT compile one token2wav
        program per length (the recompile issue called out in README)."""
        rng = np.random.default_rng(4)
        base = prompt_inputs(rng)
        src = rng.integers(0, 20, 12).astype(np.int32)  # fixed gen length via vc mode
        outs = []
        sizes = []
        for lp in (2, 3, 4):  # three distinct prompt token/mel lengths, one Lpad bucket
            inputs = dict(base)
            inputs["flow_prompt_speech_token"] = rng.integers(0, 20, lp).astype(np.int32)
            inputs["prompt_speech_feat"] = rng.random((1, 2 * lp, 80)).astype(np.float32)
            outs.append(list(engine.tts(**inputs, stream=False, source_speech_token=src))[0]["tts_speech"])
            sizes.append(engine._jit_t2w_fused._cache_size())
        assert sizes[0] == sizes[1] == sizes[2], f"t2w recompiled per prompt length: {sizes}"
        for wav in outs:
            assert wav.shape[1] == 12 * 2 * 480  # only the source tokens, prompt removed
            assert np.isfinite(wav).all()

    def test_stream_prompt_length_shares_one_program(self, engine):
        rng = np.random.default_rng(5)
        base = prompt_inputs(rng)
        src = rng.integers(0, 20, 18).astype(np.int32)
        sizes = []
        for lp in (2, 4):
            inputs = dict(base)
            inputs["flow_prompt_speech_token"] = rng.integers(0, 20, lp).astype(np.int32)
            inputs["prompt_speech_feat"] = rng.random((1, 2 * lp, 80)).astype(np.float32)
            chunks = [
                o["tts_speech"]
                for o in engine.tts(**inputs, stream=True, source_speech_token=src)
            ]
            assert all(np.isfinite(c).all() for c in chunks)
            sizes.append(engine._jit_t2w_stream._cache_size())
        # lp=2 pads to hop 5 with pad 3 (chunk_mel 16), lp=4 pads with pad 1
        # (chunk_mel 12): chunk_mel IS static, so allow those two variants but
        # no growth from the prompt length itself
        assert sizes[1] - sizes[0] <= 1, f"stream t2w recompiled per prompt length: {sizes}"

    def test_vc_mode(self, engine):
        rng = np.random.default_rng(1)
        inputs = prompt_inputs(rng)
        src = rng.integers(0, 20, 12).astype(np.int32)
        out = list(engine.tts(**inputs, stream=False, source_speech_token=src))
        wav = out[0]["tts_speech"]
        assert wav.shape[1] == 12 * 2 * 480

    def test_speed_control(self, engine):
        rng = np.random.default_rng(2)
        inputs = prompt_inputs(rng)
        src = rng.integers(0, 20, 10).astype(np.int32)
        normal = list(engine.tts(**inputs, source_speech_token=src))[0]["tts_speech"]
        fast = list(engine.tts(**inputs, source_speech_token=src, speed=2.0))[0]["tts_speech"]
        assert abs(fast.shape[1] - normal.shape[1] / 2) <= 480


class TestBucketGeo:
    """Geometric length-bucketing: bounded program universe, bounded waste."""

    def test_flat_region_and_disable(self):
        from cosyvoice_tpu.runtime.engine import _bucket, _bucket_geo

        for n in range(1, 513):
            assert _bucket_geo(n, 64, 0.125) == _bucket(n, 64)  # flat below b/rel
            assert _bucket_geo(n, 64, 0.0) == _bucket(n, 64)  # rel=0 disables

    def test_waste_and_program_count(self):
        from cosyvoice_tpu.runtime.engine import _bucket_geo

        rel, b = 0.125, 64
        buckets = set()
        for n in range(1, 8193):
            p = _bucket_geo(n, b, rel)
            assert p >= n and p % b == 0
            if n > b / rel:  # waste bound holds above the flat region
                assert (p - n) / n <= rel + 1e-9
            buckets.add(p)
        # flat would need 128 programs to cover 8192; geometric stays ~monotone
        # 8/octave above the flat region
        assert len(buckets) <= 40, len(buckets)
        # monotone: longer input never gets a smaller bucket
        ps = [_bucket_geo(n, b, rel) for n in range(1, 8193)]
        assert all(a <= c for a, c in zip(ps, ps[1:]))


class TestIncrementalStream:
    def test_incremental_matches_recompute(self, engine):
        """The incremental-flow streaming path (carried KV arenas, O(chunk *
        prefix)) must produce the same chunks as the full-prefix recompute
        path (the reference semantics, cli/model.py:292-326)."""
        rng = np.random.default_rng(9)
        inputs = prompt_inputs(rng)
        assert engine.incremental_flow
        incr = [o["tts_speech"] for o in engine.tts(**inputs, stream=True, rng_seed=13)]

        rec_eng = CosyVoice2Engine(
            engine.lm, engine.flow, engine.hift,
            engine.lm_params, engine.flow_params, engine.hift_params,
            token_hop_len=CHUNK, token_bucket=16, mel_bucket=8,
            incremental_flow=False,
        )
        rec = [o["tts_speech"] for o in rec_eng.tts(**inputs, stream=True, rng_seed=13)]
        assert len(incr) == len(rec)
        for i, (a, b) in enumerate(zip(incr, rec)):
            assert a.shape == b.shape, f"chunk {i}: {a.shape} vs {b.shape}"
            scale = max(np.abs(b).max(), 1e-6)
            diff = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
            assert diff < 2e-3, f"chunk {i}: rel diff {diff}"

    def test_incremental_state_reset_between_sessions(self, engine):
        """Two sessions through the same engine must not share flow state."""
        rng = np.random.default_rng(10)
        inputs = prompt_inputs(rng)
        a = [o["tts_speech"] for o in engine.tts(**inputs, stream=True, rng_seed=17)]
        b = [o["tts_speech"] for o in engine.tts(**inputs, stream=True, rng_seed=17)]
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_speculative_first_chunk_matches(self, engine):
        """The fused speculative first chunk (prefill + LM blocks + flow chunk
        + HiFT in one program) must be invisible: chunks and totals equal the
        non-speculative engine for the same seed — including seeds where the
        LM stops early and the speculation is discarded."""
        slow = CosyVoice2Engine(
            engine.lm, engine.flow, engine.hift,
            engine.lm_params, engine.flow_params, engine.hift_params,
            token_hop_len=CHUNK, token_bucket=16, mel_bucket=8,
            flow_incr_min_tok=0,  # same post-first-chunk path as `engine`
        )
        slow.speculative_first_chunk = False
        rng = np.random.default_rng(21)
        inputs = prompt_inputs(rng)
        assert engine.speculative_first_chunk
        checked_ok = checked_fail = False
        for seed in range(19, 27):
            fast = [o["tts_speech"] for o in engine.tts(**inputs, stream=True, rng_seed=seed)]
            ref = [o["tts_speech"] for o in slow.tts(**inputs, stream=True, rng_seed=seed)]
            assert len(fast) == len(ref), f"seed {seed}: {len(fast)} vs {len(ref)} chunks"
            for i, (a, b) in enumerate(zip(fast, ref)):
                assert a.shape == b.shape, f"seed {seed} chunk {i}"
                scale = max(np.abs(np.asarray(b)).max(), 1e-6)
                diff = np.abs(np.asarray(a) - np.asarray(b)).max() / scale
                assert diff < 2e-3, f"seed {seed} chunk {i}: rel diff {diff}"
            # classify which branch ran (total tokens >= first-chunk need?)
            total = sum(np.asarray(c).shape[1] for c in ref)
            need = (CHUNK + (CHUNK - len(inputs["flow_prompt_speech_token"]) % CHUNK) % CHUNK
                    + engine.pre_lookahead_len)
            if total // 480 >= need * 2:
                checked_ok = True
            else:
                checked_fail = True
        assert checked_ok, "no seed exercised a successful speculation"
        # early-stop seeds are probabilistic; only note coverage, don't require
