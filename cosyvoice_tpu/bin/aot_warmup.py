"""AOT compilation warmup — the TPU-native replacement for the reference's
export_jit / export_onnx / TRT engine build (cosyvoice/bin/export_*.py,
utils/file_utils.py:53-88).

On TPU there is no separate engine format: every jitted program is compiled
by XLA and can be persisted in the JAX compilation cache. This tool runs the
full inference surface of a model dir once (offline + every streaming bucket
shape) so a serving process starts with zero compile latency.

Usage: python -m cosyvoice_tpu.bin.aot_warmup --model_dir ... --cache_dir .jax_cache
"""

import argparse
import time

import numpy as np


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default="")
    parser.add_argument("--cache_dir", default=".jax_cache")
    parser.add_argument("--max_seconds", type=int, default=30, help="longest utterance to pre-bucket")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from cosyvoice_tpu.runtime.api import AutoModel

    t0 = time.time()
    model = AutoModel(args.model_dir)
    engine = model.engine
    rng = np.random.default_rng(0)

    prompt_tokens = rng.integers(0, 6561, 50).astype(np.int32)
    prompt_feat = (rng.random((1, 100, 80)).astype(np.float32) * 2 - 12)
    emb = rng.standard_normal((1, 192)).astype(np.float32)
    text = rng.integers(0, 1000, 30).astype(np.int32)

    # offline + streaming passes compile every bucket the engine uses
    for stream in (False, True):
        for _ in engine.tts(
            text_tokens=text,
            prompt_text_tokens=np.zeros(0, np.int32),
            llm_prompt_speech_token=prompt_tokens,
            flow_prompt_speech_token=prompt_tokens,
            prompt_speech_feat=prompt_feat,
            flow_embedding=emb,
            stream=stream,
            rng_seed=7,
        ):
            pass
    print(f"warmup complete in {time.time() - t0:.1f}s; cache at {args.cache_dir}")


if __name__ == "__main__":
    main()
