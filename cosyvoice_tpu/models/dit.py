"""DiT flow estimator (CosyVoice3 / F5-TTS style) in JAX.

Re-design of cosyvoice/flow/DiT/dit.py:104-176 + DiT/modules.py (DiTBlock,
AdaLayerNormZero, AttnProcessor, CausalConvPositionEmbedding,
TimestepEmbedding). Notable reference quirks preserved for checkpoint parity:

- rotary embedding (interleaved-pair, x-transformers style) is applied to the
  first `dim_head` dims of the *pre-head-split* q/k projections only
  (modules.py:368-373)
- AdaLN-Zero modulation: 6-way chunk from one SiLU+Linear on the timestep
  embedding; final AdaLayerNormZero_Final before proj_out
- attention masks: [B, T, T] bool (chunked when streaming)
"""

from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.conv import CausalConv1d
from cosyvoice_tpu.ops.masks import subsequent_chunk_mask


@dataclass(frozen=True)
class DiTConfig:
    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 80
    mu_dim: int = 80
    spk_dim: int = 80
    static_chunk_size: int = 50
    freq_embed_dim: int = 256


@lru_cache(maxsize=8)
def _rope_tables(dim_head: int, max_len: int, theta: float = 10000.0):
    inv = 1.0 / (theta ** (np.arange(0, dim_head, 2) / dim_head))
    freqs = np.outer(np.arange(max_len), inv)  # [T, dim_head/2]
    # interleaved: repeat each frequency twice
    cos = np.repeat(np.cos(freqs), 2, axis=-1).astype(np.float32)
    sin = np.repeat(np.sin(freqs), 2, axis=-1).astype(np.float32)
    return cos, sin


def _rotate_half_interleaved(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_partial_rope(x: jax.Array, dim_head: int) -> jax.Array:
    """Rotate the first dim_head dims of [..., T, D] (x-transformers quirk)."""
    T = x.shape[-2]
    cos, sin = _rope_tables(dim_head, T)
    head, rest = x[..., :dim_head], x[..., dim_head:]
    head = head * jnp.asarray(cos) + _rotate_half_interleaved(head) * jnp.asarray(sin)
    return jnp.concatenate([head, rest], axis=-1)


class DiTTimestepEmbedding(nn.Module):
    dim: int
    freq_embed_dim: int = 256

    @nn.compact
    def __call__(self, t):
        half = self.freq_embed_dim // 2
        emb = np.log(10000.0) / (half - 1)
        emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        emb = 1000.0 * t[:, None] * emb[None, :]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
        h = nn.Dense(self.dim, name="mlp1")(emb)
        return nn.Dense(self.dim, name="mlp2")(jax.nn.silu(h))


class CausalConvPositionEmbedding(nn.Module):
    """Two left-causal grouped convs with Mish (modules.py:115-146)."""

    dim: int
    kernel_size: int = 31
    groups: int = 16

    @nn.compact
    def __call__(self, x, mask=None):
        from cosyvoice_tpu.nn.activation import mish

        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        h = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        from cosyvoice_tpu.nn.conv import Conv1d

        h = mish(Conv1d(self.dim, self.kernel_size, groups=self.groups, name="conv1")(h))
        h = jnp.pad(h, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        h = mish(Conv1d(self.dim, self.kernel_size, groups=self.groups, name="conv2")(h))
        if mask is not None:
            h = jnp.where(mask[..., None], h, 0.0)
        return h


class DiTBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t_emb, attn_mask):
        c = self.cfg
        mod = nn.Dense(c.dim * 6, name="adaln")(jax.nn.silu(t_emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="attn_norm")(x)
        h = h * (1 + scale_msa[:, None]) + shift_msa[:, None]

        inner = c.heads * c.dim_head
        q = nn.Dense(inner, name="to_q")(h)
        k = nn.Dense(inner, name="to_k")(h)
        v = nn.Dense(inner, name="to_v")(h)
        q = apply_partial_rope(q, c.dim_head)
        k = apply_partial_rope(k, c.dim_head)
        B, T, _ = h.shape
        q = q.reshape(B, T, c.heads, c.dim_head)
        k = k.reshape(B, T, c.heads, c.dim_head)
        v = v.reshape(B, T, c.heads, c.dim_head)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(c.dim_head)
        scores = jnp.where(attn_mask[:, None, :, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, inner)
        o = nn.Dense(c.dim, name="to_out")(o)
        x = x + gate_msa[:, None] * o

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="ff_norm")(x)
        h = h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        h = nn.Dense(c.dim * c.ff_mult, name="ff_in")(h)
        h = jax.nn.gelu(h, approximate=True)
        h = nn.Dense(c.dim, name="ff_out")(h)
        return x + gate_mlp[:, None] * h


class DiTEstimator(nn.Module):
    """Drop-in estimator with the (x, mask, mu, t, spks, cond) interface."""

    cfg: DiTConfig = DiTConfig()

    @nn.compact
    def __call__(self, x, mask, mu, t, spks, cond, streaming: bool = False):
        """x/mu/cond: [B, T, 80]; mask: [B, T] float; t: [B]; spks: [B, 80]."""
        c = self.cfg
        B, T, _ = x.shape
        t_emb = DiTTimestepEmbedding(c.dim, c.freq_embed_dim, name="time_embed")(t)

        spk_b = jnp.broadcast_to(spks[:, None, :], (B, T, spks.shape[-1]))
        h = nn.Dense(c.dim, name="input_proj")(jnp.concatenate([x, cond, mu, spk_b], axis=-1))
        h = CausalConvPositionEmbedding(c.dim, name="conv_pos")(h, mask > 0.5) + h

        pad = mask > 0.5
        am = pad[:, None, :]
        if streaming:
            am = am & subsequent_chunk_mask(T, c.static_chunk_size)[None]
        else:
            am = jnp.broadcast_to(am, (B, T, T))

        for i in range(c.depth):
            h = DiTBlock(c, name=f"blocks_{i}")(h, t_emb, am)

        mod = nn.Dense(c.dim * 2, name="final_adaln")(jax.nn.silu(t_emb))
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm_out")(h)
        h = h * (1 + scale)[:, None, :] + shift[:, None, :]
        out = nn.Dense(c.mel_dim, name="proj_out")(h)
        return out * mask[..., None]
