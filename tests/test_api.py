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
