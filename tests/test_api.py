import numpy as np
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.models.flow import FlowConfig
from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig
from cosyvoice_tpu.models.hift import HiFTConfig
from cosyvoice_tpu.models.llm import LMConfig
from cosyvoice_tpu.models.qwen2 import Qwen2Config


@pytest.fixture(scope="module")
def api():
    from cosyvoice_tpu.runtime.api import CosyVoice2

    lm_cfg = LMConfig(
        speech_token_size=6561,
        block_size=8,
        qwen=Qwen2Config(
            hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
            intermediate_size=64, vocab_size=300, max_cache_len=512, dtype=jnp.float32,
        ),
    )
    flow_cfg = FlowConfig(
        input_size=32, vocab_size=6561, chunk_size=5, attention_heads=2, linear_units=64,
        num_blocks=1, num_up_blocks=1,
        estimator=EstimatorConfig(channels=(32,), attention_head_dim=8, n_blocks=1, num_mid_blocks=1,
                                  num_heads=2, static_chunk_size=10, causal=True),
        cfm=CFMConfig(n_timesteps=2),
    )
    hift_cfg = HiFTConfig(
        base_channels=32, resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
        source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)),
    )
    return CosyVoice2(lm_cfg=lm_cfg, flow_cfg=flow_cfg, hift_cfg=hift_cfg)


class TestAPI:
    def test_zero_shot_offline(self, api):
        api.engine.token_hop_len = 5
        rng = np.random.default_rng(0)
        prompt_wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
        outs = list(api.inference_zero_shot("Hi there friend.", "A prompt.", prompt_wav))
        assert len(outs) >= 1
        assert all(o["tts_speech"].shape[0] == 1 for o in outs)

    def test_vc(self, api):
        rng = np.random.default_rng(1)
        prompt_wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
        src = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
        outs = list(api.inference_vc(src, prompt_wav))
        assert outs[0]["tts_speech"].shape[1] > 0

    def test_save_and_reload(self, api, tmp_path):
        from cosyvoice_tpu.runtime.api import CosyVoice2

        api.save_pretrained(str(tmp_path))
        assert (tmp_path / "lm.msgpack").exists()


class TestEvalQuality:
    @pytest.mark.slow
    def test_eval_cli(self, tmp_path):
        """tools.eval_quality end-to-end on a tiny random-weight model: CER via
        a stub ASR + CAM++ speaker similarity over a 2-utt tts_text set."""
        import json as _json
        import os
        import subprocess
        import sys

        from cosyvoice_tpu.utils.audio_io import save_wav

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = {
            "version": 2,
            "llm": {
                "speech_token_size": 6561, "block_size": 8,
                "qwen": {"hidden_size": 32, "num_layers": 1, "num_heads": 2, "num_kv_heads": 1,
                         "head_dim": 16, "intermediate_size": 64, "vocab_size": 160000,
                         "max_cache_len": 512, "dtype": "float32"},
            },
            "flow": {"input_size": 32, "attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                     "num_up_blocks": 1,
                     "estimator": {"channels": [32], "attention_head_dim": 8, "n_blocks": 1,
                                   "num_mid_blocks": 1, "num_heads": 2},
                     "cfm": {"n_timesteps": 1}},
            "hift": {"base_channels": 32, "resblock_kernel_sizes": [3], "resblock_dilations": [[1]],
                     "source_resblock_kernel_sizes": [7, 7, 11],
                     "source_resblock_dilations": [[1], [1], [1]]},
        }
        (tmp_path / "config.json").write_text(_json.dumps(cfg))
        save_wav(str(tmp_path / "p1.wav"), np.random.RandomState(0).randn(16000) * 0.05, 16000)
        (tmp_path / "wav.scp").write_text(f"u1 {tmp_path}/p1.wav\n")
        (tmp_path / "text").write_text("u1 a prompt transcript\n")
        (tmp_path / "tts_text.json").write_text(_json.dumps({"u1": ["hello world synthesis check"]}))
        (tmp_path / "stub_asr.py").write_text(
            "def transcribe(wav, sr):\n    return 'hello world synthesis check'\n")

        r = subprocess.run(
            [sys.executable, "-m", "cosyvoice_tpu.tools.eval_quality",
             "--model_dir", str(tmp_path), "--tts_text", str(tmp_path / "tts_text.json"),
             "--prompt_scp", str(tmp_path / "wav.scp"), "--prompt_text", str(tmp_path / "text"),
             "--asr", "stub_asr:transcribe"],
            capture_output=True, text=True, timeout=1500, cwd=repo,
            env={**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": f"{tmp_path}:{repo}"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out = _json.loads(r.stdout.strip().splitlines()[-1])
        assert out["n"] == 1
        assert out["cer"] == 0.0  # stub ASR returns the exact text
        assert -1.0 <= out["speaker_similarity"] <= 1.0


class TestV1API:
    @pytest.mark.slow
    def test_v1_zero_shot_offline(self):
        """CosyVoice (v1) public zero-shot path (borrows CosyVoice2's
        inference methods incl. _run_segments — regression: AttributeError
        when _run_segments was not in the borrowed set)."""
        import jax.numpy as jnp

        from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig
        from cosyvoice_tpu.models.flow_v1 import FlowV1Config
        from cosyvoice_tpu.models.hift import HiFTConfig
        from cosyvoice_tpu.models.llm_v1 import LMv1Config
        from cosyvoice_tpu.runtime.api import CosyVoice

        model = CosyVoice(
            lm_cfg=LMv1Config(
                text_encoder_input_size=16, llm_input_size=32, llm_output_size=32,
                text_token_size=160000, speech_token_size=6561,
                te_heads=2, te_linear_units=32, te_blocks=1,
                lm_heads=2, lm_linear_units=32, lm_blocks=1, max_cache_len=512, block_size=8,
            ),
            flow_cfg=FlowV1Config(
                input_size=16, vocab_size=6561, attention_heads=2, linear_units=32, num_blocks=1,
                regulator_ratios=(1,),
                estimator=EstimatorConfig(channels=(16, 16), attention_head_dim=8, n_blocks=1,
                                          num_mid_blocks=1, num_heads=2, causal=False),
                cfm=CFMConfig(n_timesteps=1),
            ),
            hift_cfg=HiFTConfig(
                sampling_rate=22050, base_channels=32, upsample_rates=(8, 8),
                upsample_kernel_sizes=(16, 16), resblock_kernel_sizes=(3,),
                resblock_dilations=((1,),), source_resblock_kernel_sizes=(7, 11),
                source_resblock_dilations=((1,), (1,)),
            ),
        )
        prompt = np.random.RandomState(0).randn(1, 8000).astype(np.float32) * 0.05
        outs = list(model.inference_zero_shot("hello there world", "a prompt", prompt))
        assert len(outs) >= 1
        assert all(o["tts_speech"].shape[1] > 0 for o in outs)


class TestV3API:
    @pytest.fixture(scope="class")
    def api3(self):
        from cosyvoice_tpu.models.dit import DiTConfig
        from cosyvoice_tpu.runtime.api import CosyVoice3

        lm_cfg = LMConfig(
            speech_token_size=6561, num_special_head=200, special_in_speech_table=True,
            block_size=8,
            qwen=Qwen2Config(
                hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                intermediate_size=64, vocab_size=300, max_cache_len=512, dtype=jnp.float32,
            ),
        )
        flow_cfg = FlowConfig(
            input_size=80, vocab_size=6561, chunk_size=5,
            encoder_type="dit_prelookahead", estimator_type="dit", dit_lookahead_channels=32,
            dit=DiTConfig(dim=32, depth=1, heads=2, dim_head=8, static_chunk_size=10, freq_embed_dim=16),
            cfm=CFMConfig(n_timesteps=2),
        )
        hift_cfg = HiFTConfig(
            base_channels=32, causal=True,
            resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
            source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)),
        )
        return CosyVoice3(lm_cfg=lm_cfg, flow_cfg=flow_cfg, hift_cfg=hift_cfg)

    def test_v3_zero_shot_offline(self, api3):
        api3.engine.token_hop_len = 5
        rng = np.random.default_rng(0)
        prompt_wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
        outs = list(api3.inference_zero_shot("Hello from version three.", "A prompt.", prompt_wav))
        assert len(outs) >= 1
        assert all(o["tts_speech"].shape[0] == 1 for o in outs)

    def test_v3_instruct2(self, api3):
        rng = np.random.default_rng(1)
        prompt_wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)
        outs = list(api3.inference_instruct2("Read this.", "Speak warmly", prompt_wav))
        assert outs and outs[0]["tts_speech"].shape[1] > 0


class TestAutoModelDetection:
    def test_version_from_config_json(self, tmp_path):
        import json

        from cosyvoice_tpu.runtime.api import detect_model_version

        (tmp_path / "config.json").write_text(json.dumps({"version": 3}))
        assert detect_model_version(str(tmp_path)) == 3

    def test_version_from_reference_yaml_names(self, tmp_path):
        from cosyvoice_tpu.runtime.api import detect_model_version

        assert detect_model_version(str(tmp_path)) == 2  # default
        (tmp_path / "cosyvoice.yaml").write_text("")
        assert detect_model_version(str(tmp_path)) == 1
        (tmp_path / "cosyvoice2.yaml").write_text("")
        assert detect_model_version(str(tmp_path)) == 2
        (tmp_path / "cosyvoice3.yaml").write_text("")
        assert detect_model_version(str(tmp_path)) == 3


class TestDeterminism:
    def test_same_seed_identical_audio(self, api):
        """Two runs with the same engine seed must produce bit-identical
        audio (fixed CFM noise buffer + seeded RAS sampling + deterministic
        vocoder noise — the reference needs the same hooks, SURVEY §7.3)."""
        rng = np.random.default_rng(5)
        prompt_wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)

        def run():
            outs = list(api.inference_zero_shot("Determinism check sentence.", "A prompt.", prompt_wav))
            return np.concatenate([o["tts_speech"] for o in outs], axis=1)

        a, b = run(), run()
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)


class TestBistreamTextInput:
    def test_generator_text_matches_engine_bistream(self, api):
        """Generator tts_text at the public API (reference cli/cosyvoice.py:91
        accepts a Generator) must route to the LM's bistream decode and
        produce the same audio as driving engine.generate_bistream directly
        (the disaggregated gateway's path)."""
        rng = np.random.default_rng(3)
        prompt_wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)

        def pieces():
            yield "Hello there "
            yield "my friend, how "
            yield "are you today?"

        api.engine.token_hop_len = 5
        outs = list(api.inference_zero_shot(pieces(), "A prompt.", prompt_wav, stream=False))
        wav_api = np.concatenate([o["tts_speech"] for o in outs], axis=1)
        assert wav_api.shape[1] > 0

        # same text through the engine-level bistream path
        fe = api.frontend
        mi = fe.frontend_zero_shot("Hello there my friend, how are you today?", "A prompt.", prompt_wav)
        text_chunks = [fe._extract_text_token(p) for p in ["Hello there ", "my friend, how ", "are you today?"]]
        import jax

        gen = api.engine._squelch(api.engine.lm.generate_bistream(
            api.engine.lm_params, iter(text_chunks),
            mi["prompt_text_tokens"].astype(np.int32),
            mi["llm_prompt_speech_token"].astype(np.int32),
            jax.random.PRNGKey(api.engine.seed),
        ))
        toks = []
        for b in gen:
            toks.extend(b.tolist())
        wav_direct = api.engine.synthesize_offline(
            np.asarray(toks, np.int32),
            mi["flow_prompt_speech_token"].astype(np.int32),
            mi["prompt_speech_feat"], mi["flow_embedding"],
        )
        assert wav_api.shape == wav_direct.shape
        np.testing.assert_allclose(wav_api, np.asarray(wav_direct), rtol=1e-4, atol=1e-4)

    def test_generator_text_streaming(self, api):
        rng = np.random.default_rng(4)
        prompt_wav = (rng.standard_normal((1, 16000)) * 0.1).astype(np.float32)

        def pieces():
            yield "Stream me "
            yield "in pieces now."

        outs = list(api.inference_zero_shot(pieces(), "A prompt.", prompt_wav, stream=True))
        assert len(outs) >= 1
        assert sum(o["tts_speech"].shape[1] for o in outs) > 0
