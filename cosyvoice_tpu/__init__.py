"""cosyvoice_tpu — a TPU-native (JAX/XLA/Pallas) zero-shot streaming TTS framework.

Re-designed from scratch with the capabilities of FunAudioLLM/CosyVoice
(LM -> speech tokens -> flow-matching mel -> HiFT vocoder), built TPU-first:

- pure-functional flax models, explicit streaming-cache pytrees
- fixed-shape bucketed inference (XLA-friendly), lax.scan hot loops
- blockwise on-device autoregressive decode with preallocated KV cache
- jax.sharding.Mesh + pjit/shard_map parallelism for training and serving

Public API mirrors the reference (`cosyvoice/cli/cosyvoice.py`):
`CosyVoice2`, `AutoModel`, `inference_zero_shot/cross_lingual/instruct2/vc`.
"""

__version__ = "0.1.0"
