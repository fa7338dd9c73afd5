"""Online (on-accelerator) feature extraction during training.

Replaces cosyvoice/utils/onnx.py:7-54 (batch ONNX speech-token extraction
gated by the `onnx_path` env, used in llm/flow training when the parquet
lacks precomputed tokens): the JAX S3Tokenizer runs batched on the training
devices, so the 25 Hz semantic tokens come straight from the whisper fbank
already in the batch.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.speech_tokenizer import S3Tokenizer, S3TokenizerConfig


class OnlineSpeechTokenExtractor:
    def __init__(self, params=None, cfg: Optional[S3TokenizerConfig] = None, rng_seed: int = 0):
        self.tokenizer = S3Tokenizer(cfg or S3TokenizerConfig())
        if params is None:
            mel0 = jnp.zeros((1, 100, 128))
            params = self.tokenizer.init(jax.random.PRNGKey(rng_seed), mel0, jnp.asarray([100]))
        self.params = params
        self._jit = jax.jit(lambda p, mel, ml: self.tokenizer.apply(p, mel, ml))

    def __call__(self, whisper_feat: np.ndarray, whisper_feat_len: np.ndarray):
        """[B, T, 128] @100 Hz -> (tokens [B, T_tok] int32, token_len [B])."""
        toks, lens = self._jit(self.params, jnp.asarray(whisper_feat), jnp.asarray(whisper_feat_len))
        return np.asarray(toks), np.asarray(lens)

    def add_to_batch(self, batch: dict) -> dict:
        """Fill batch['speech_token'] from whisper features when absent
        (llm/llm.py:369-371, flow/flow.py:191-192)."""
        if "speech_token" in batch or "whisper_feat" not in batch:
            return batch
        toks, lens = self(batch["whisper_feat"], batch["whisper_feat_len"])
        batch = dict(batch)
        batch["speech_token"], batch["speech_token_len"] = toks, lens
        return batch
