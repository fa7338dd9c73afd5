"""Batched-serving example — the reference vllm_example.py role
(vllm_example.py:12-30): load a model with the high-throughput LM engine
enabled, then (a) run concurrent zero-shot requests through the
continuous-batching scheduler and (b) run a reseeded multi-iteration
stability loop.

Tiny random-weight models by default so it runs anywhere; pass --model_dir
for converted checkpoints at full size (add quant_lm int8 for 2x decode).

Usage: python batch_example.py [--model_dir DIR] [--iters 100] [--concurrency 4]
"""

import argparse
import threading
import time

import numpy as np


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default="")
    parser.add_argument("--iters", type=int, default=8, help="stability loop iterations (reference uses 100)")
    parser.add_argument("--concurrency", type=int, default=4)
    parser.add_argument("--quant_lm", default="", choices=["", "int8", "int4"])
    args = parser.parse_args()

    import jax.numpy as jnp

    from cosyvoice_tpu.runtime.api import CosyVoice2

    if args.model_dir:
        model = CosyVoice2(args.model_dir, quant_lm=args.quant_lm or False)
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
                input_size=64, vocab_size=6561, attention_heads=2, linear_units=128, num_blocks=1,
                num_up_blocks=1, estimator=EstimatorConfig(channels=(32,), n_blocks=1, num_mid_blocks=1,
                                                           num_heads=2), cfm=CFMConfig(n_timesteps=2),
            ),
            hift_cfg=HiFTConfig(base_channels=32),
            quant_lm=args.quant_lm or False,
        )

    # the vLLM-engine role: shared continuous-batching decode loop
    model.enable_continuous_batching(max_batch=args.concurrency)
    prompt = np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.05

    def synthesize(i, out):
        t0 = time.time()
        n = 0
        for chunk in model.inference_zero_shot(
            f"Concurrent request number {i}, checking the batched decode path.",
            "prompt transcript", prompt, stream=False, text_frontend=False,
        ):
            n += chunk["tts_speech"].shape[-1]
        out[i] = (time.time() - t0, n)

    print(f"== {args.concurrency} concurrent zero-shot requests (continuous batching) ==")
    results = {}
    threads = [threading.Thread(target=synthesize, args=(i, results)) for i in range(args.concurrency)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    total_audio = sum(n for _, n in results.values()) / model.sample_rate
    print(f"  {args.concurrency} requests in {wall:.2f}s, {total_audio:.2f}s audio, "
          f"aggregate RTF {wall / max(total_audio, 1e-9):.4f}")

    # reseeded stability loop (vllm_example.py:16-19), with per-iteration RTF
    # spread so soak runs leave quantitative evidence
    print(f"== stability loop x{args.iters} ==")
    rtfs = []
    for i in range(args.iters):
        np.random.seed(i)
        t0 = time.time()
        n = 0
        for chunk in model.inference_zero_shot(
            "A short stability check sentence.", "prompt transcript", prompt,
            stream=False, text_frontend=False,
        ):
            n += chunk["tts_speech"].shape[-1]
        rtfs.append(((time.time() - t0), n / model.sample_rate))
    # random-weight LMs may legally stop after 1 token (non-EOS stop rows are
    # samplable pre-min_len, reference llm.py:544-545) — report those
    # degenerate-length iterations separately instead of letting a ~0s
    # denominator blow up the RTF spread
    good = np.sort([w / a for w, a in rtfs if a >= 0.2])
    print(f"  {len(rtfs)} iterations complete ({len(rtfs) - len(good)} degenerate-length); "
          f"RTF min {good[0]:.4f} p50 {good[len(good) // 2]:.4f} "
          f"p95 {good[int(len(good) * 0.95)]:.4f} max {good[-1]:.4f}"
          if len(good) else f"  {len(rtfs)} iterations complete, all degenerate-length")
    print("done.")


if __name__ == "__main__":
    main()
