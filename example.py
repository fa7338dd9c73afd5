"""End-to-end smoke example (mirrors the reference example.py modes).

Runs zero-shot / cross-lingual / instruct2 / vc on synthetic prompt audio
with tiny random-weight models so it completes quickly anywhere; pass
--model_dir to use converted checkpoints at full size.
"""

import argparse

import numpy as np


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default="")
    parser.add_argument("--full_size", action="store_true")
    parser.add_argument("--out_prefix", default="demo")
    args = parser.parse_args()

    import jax.numpy as jnp

    from cosyvoice_tpu.runtime.api import CosyVoice2
    from cosyvoice_tpu.utils.audio_io import save_wav

    if args.model_dir or args.full_size:
        model = CosyVoice2(args.model_dir)
    else:
        from cosyvoice_tpu.models.flow import FlowConfig
        from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig
        from cosyvoice_tpu.models.hift import HiFTConfig
        from cosyvoice_tpu.models.llm import LMConfig
        from cosyvoice_tpu.models.qwen2 import Qwen2Config

        model = CosyVoice2(
            lm_cfg=LMConfig(
                speech_token_size=6561, block_size=28,
                qwen=Qwen2Config(hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                                 intermediate_size=128, vocab_size=512, max_cache_len=1024, dtype=jnp.float32),
            ),
            flow_cfg=FlowConfig(
                input_size=64, attention_heads=2, linear_units=128, num_blocks=1, num_up_blocks=1,
                estimator=EstimatorConfig(channels=(32,), attention_head_dim=8, n_blocks=1, num_mid_blocks=2,
                                          num_heads=2),
                cfm=CFMConfig(n_timesteps=4),
            ),
            hift_cfg=HiFTConfig(base_channels=64, resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
                                source_resblock_kernel_sizes=(7, 7, 11),
                                source_resblock_dilations=((1,), (1,), (1,))),
        )

    rng = np.random.default_rng(0)
    prompt_wav = (rng.standard_normal((1, 32000)) * 0.05).astype(np.float32)

    print("== zero_shot (offline) ==")
    for i, out in enumerate(model.inference_zero_shot("Hello there, nice to meet you.", "A prompt.", prompt_wav)):
        save_wav(f"{args.out_prefix}_zero_shot_{i}.wav", out["tts_speech"], model.sample_rate)
        print(f"  chunk {i}: {out['tts_speech'].shape[1] / model.sample_rate:.2f}s")

    print("== zero_shot (streaming) ==")
    for i, out in enumerate(
        model.inference_zero_shot("Streaming synthesis, chunk by chunk.", "A prompt.", prompt_wav, stream=True)
    ):
        print(f"  chunk {i}: {out['tts_speech'].shape[1] / model.sample_rate:.2f}s")

    print("== cross_lingual ==")
    for i, out in enumerate(model.inference_cross_lingual("A different language text.", prompt_wav)):
        print(f"  chunk {i}: {out['tts_speech'].shape[1] / model.sample_rate:.2f}s")

    print("== instruct2 ==")
    for i, out in enumerate(model.inference_instruct2("Read this warmly.", "Speak softly", prompt_wav)):
        print(f"  chunk {i}: {out['tts_speech'].shape[1] / model.sample_rate:.2f}s")

    print("== vc ==")
    src = (rng.standard_normal((1, 16000)) * 0.05).astype(np.float32)
    for i, out in enumerate(model.inference_vc(src, prompt_wav)):
        print(f"  chunk {i}: {out['tts_speech'].shape[1] / model.sample_rate:.2f}s")

    print("done.")


if __name__ == "__main__":
    main()
