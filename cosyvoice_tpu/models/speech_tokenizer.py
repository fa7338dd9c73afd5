"""Supervised semantic speech tokenizer (S3-style) in JAX.

Replaces the reference's ONNX `speech_tokenizer_v{1,2,3}.onnx` sessions
(cli/frontend.py:46-48,95-106; the same graph is loaded into torch via the
public `s3tokenizer` package in runtime/triton_trtllm/token2wav.py:114,200).

Architecture: whisper-style audio encoder over 128-bin log-mel at 100 Hz —
conv(k3,s1) + GELU, conv(k3,s2) + GELU (-> 50 Hz), sinusoidal positions,
pre-LN transformer blocks — followed by a quantizer:

- v1 (50 Hz):  VQ, euclidean codebook of 4096
- v2 (25 Hz):  extra stride-2 stage, FSQ with 3^8 = 6561 codes
- v3 (25 Hz):  FSQ (6561) with the CosyVoice3 code layout

Weight conversion: tools/convert_checkpoint.convert_s3_tokenizer consumes the
graph read by tools/onnx_reader; the architecture (depth/width/quantizer
family/token rate) is derived from the graph's own tensors by
s3_config_from_weights, so a released checkpoint that differs from the
defaults below drives the module rather than silently mismatching. Conversion
is strict both ways: every graph tensor must be consumed and every flax leaf
filled (tests/test_convert_s3.py).
"""

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import Conv1d
from cosyvoice_tpu.ops.masks import make_non_pad_mask


@dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    d_model: int = 1280
    num_heads: int = 20
    num_layers: int = 6
    codebook_size: int = 6561
    use_fsq: bool = True  # v2/v3; v1 uses VQ-4096
    fsq_levels: Tuple[int, ...] = (3,) * 8
    token_rate_div: int = 2  # extra downsample after the 50 Hz conv stack (v2/v3)


def sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class _EncoderBlock(nn.Module):
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x, pad_mask):
        h = nn.LayerNorm(name="attn_ln")(x)
        B, T, C = h.shape
        hd = C // self.num_heads
        q = nn.Dense(C, name="q")(h).reshape(B, T, self.num_heads, hd)
        k = nn.Dense(C, use_bias=False, name="k")(h).reshape(B, T, self.num_heads, hd)
        v = nn.Dense(C, name="v")(h).reshape(B, T, self.num_heads, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, C)
        x = x + nn.Dense(C, name="out")(o)
        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(4 * C, name="mlp_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(C, name="mlp_out")(h)


class S3Tokenizer(nn.Module):
    cfg: S3TokenizerConfig = S3TokenizerConfig()

    @nn.compact
    def __call__(self, mel: jax.Array, mel_len: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """mel: [B, T, 128] whisper log-mel at 100 Hz; mel_len: [B].

        Returns (tokens [B, T_tok], token_len [B]) at 25 Hz (v2/v3)."""
        c = self.cfg
        x = jax.nn.gelu(Conv1d(c.d_model, 3, padding=1, name="conv1")(mel), approximate=False)
        x = jax.nn.gelu(Conv1d(c.d_model, 3, stride=2, padding=1, name="conv2")(x), approximate=False)
        T = x.shape[1]
        x = x + jnp.asarray(sinusoids(T, c.d_model))[None]
        out_len = (mel_len + 1) // 2
        pad_mask = make_non_pad_mask(out_len, T)
        for i in range(c.num_layers):
            x = _EncoderBlock(c.d_model, c.num_heads, name=f"blocks_{i}")(x, pad_mask)
        x = nn.LayerNorm(name="ln_post")(x)
        if c.token_rate_div > 1:
            # 50 -> 25 Hz: strided conv downsample
            x = jax.nn.gelu(
                Conv1d(c.d_model, 3, stride=c.token_rate_div, padding=1, name="conv_ds")(x), approximate=False
            )
            out_len = (out_len + c.token_rate_div - 1) // c.token_rate_div

        if c.use_fsq:
            levels = np.asarray(c.fsq_levels)
            proj = nn.Dense(len(levels), name="fsq_proj")(x)  # [B, T, 8]
            half = jnp.asarray((levels - 1) / 2.0, jnp.float32)
            q = jnp.round(jnp.tanh(proj) * half + half)  # per-dim ints in [0, L)
            strides = jnp.asarray(np.cumprod([1] + list(levels[:-1])), jnp.float32)
            tokens = jnp.sum(q * strides, axis=-1).astype(jnp.int32)
        else:
            codebook = self.param(
                "codebook", nn.initializers.normal(1.0), (c.codebook_size, c.d_model)
            )
            d = (
                jnp.sum(jnp.square(x), -1, keepdims=True)
                - 2.0 * jnp.einsum("btc,vc->btv", x, codebook)
                + jnp.sum(jnp.square(codebook), -1)[None, None, :]
            )
            tokens = jnp.argmin(d, axis=-1).astype(jnp.int32)
        return tokens, out_len
