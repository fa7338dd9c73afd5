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


def apply_partial_rope(x: jax.Array, dim_head: int, pos=None, max_len: int = 0) -> jax.Array:
    """Rotate the first dim_head dims of [..., T, D] (x-transformers quirk).

    pos/max_len: incremental-chunk mode — x covers absolute positions
    [pos, pos+T) of a sequence bounded by max_len; the table rows are sliced
    at the traced offset so chunk rope == full-sequence rope."""
    T = x.shape[-2]
    if pos is None:
        cos, sin = _rope_tables(dim_head, T)
        cos_j, sin_j = jnp.asarray(cos), jnp.asarray(sin)
    else:
        cos, sin = _rope_tables(dim_head, max_len)
        cos_j = jax.lax.dynamic_slice_in_dim(jnp.asarray(cos), pos, T, axis=0)
        sin_j = jax.lax.dynamic_slice_in_dim(jnp.asarray(sin), pos, T, axis=0)
    head, rest = x[..., :dim_head], x[..., dim_head:]
    head = head * cos_j + _rotate_half_interleaved(head) * sin_j
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
    def __call__(self, x, mask=None, caches=None, real_n=None):
        """caches=(c1, c2) [B, k-1, dim]: incremental-chunk mode — c1 holds
        the masked inputs, c2 the post-mish conv1 outputs left of the chunk;
        returns (h, new_caches)."""
        from cosyvoice_tpu.nn.activation import mish
        from cosyvoice_tpu.nn.conv import Conv1d

        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        if caches is not None:
            from cosyvoice_tpu.nn.conv import roll_cache

            c1, c2 = caches
            h1 = mish(Conv1d(self.dim, self.kernel_size, groups=self.groups, name="conv1")(
                jnp.concatenate([c1, x], axis=1)))
            h = mish(Conv1d(self.dim, self.kernel_size, groups=self.groups, name="conv2")(
                jnp.concatenate([c2, h1], axis=1)))
            if mask is not None:
                h = jnp.where(mask[..., None], h, 0.0)
            return h, (roll_cache(c1, x, real_n), roll_cache(c2, h1, real_n))
        h = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        h = mish(Conv1d(self.dim, self.kernel_size, groups=self.groups, name="conv1")(h))
        h = jnp.pad(h, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        h = mish(Conv1d(self.dim, self.kernel_size, groups=self.groups, name="conv2")(h))
        if mask is not None:
            h = jnp.where(mask[..., None], h, 0.0)
        return h


class DiTBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t_emb, attn_mask, arena=None, pos=None):
        """arena=(k_arena, v_arena) [B, A, inner], pos: incremental-chunk
        mode — x is the new chunk, attn_mask a bool [B, n, A] arena mask;
        returns (y, new_arena)."""
        c = self.cfg
        mod = nn.Dense(c.dim * 6, name="adaln")(jax.nn.silu(t_emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="attn_norm")(x)
        h = h * (1 + scale_msa[:, None]) + shift_msa[:, None]

        inner = c.heads * c.dim_head
        q = nn.Dense(inner, name="to_q")(h)
        k = nn.Dense(inner, name="to_k")(h)
        v = nn.Dense(inner, name="to_v")(h)
        B, T, _ = h.shape
        new_arena = None
        if arena is None:
            q = apply_partial_rope(q, c.dim_head)
            k = apply_partial_rope(k, c.dim_head)
            S = T
        else:
            A = arena[0].shape[1]
            q = apply_partial_rope(q, c.dim_head, pos=pos, max_len=A)
            k = apply_partial_rope(k, c.dim_head, pos=pos, max_len=A)
            k_arena = jax.lax.dynamic_update_slice(arena[0], k.astype(arena[0].dtype), (0, pos, 0))
            v_arena = jax.lax.dynamic_update_slice(arena[1], v.astype(arena[1].dtype), (0, pos, 0))
            new_arena = (k_arena, v_arena)
            k, v = k_arena, v_arena
            S = A
        q = q.reshape(B, T, c.heads, c.dim_head)
        k = k.reshape(B, S, c.heads, c.dim_head)
        v = v.reshape(B, S, c.heads, c.dim_head)
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
        y = x + gate_mlp[:, None] * h
        return y if arena is None else (y, new_arena)


def dit_stream_state(cfg: DiTConfig, B2: int, arena: int):
    """Zero incremental-chunk state for ONE Euler step of DiTEstimator: KV
    arenas per block + the conv-position-embedding caches. B2 = 2*B (CFG
    batch doubling); stack n_timesteps copies outside for the solver scan."""
    inner = cfg.heads * cfg.dim_head
    st = {"conv_pos": (jnp.zeros((B2, 30, cfg.dim)), jnp.zeros((B2, 30, cfg.dim)))}
    for i in range(cfg.depth):
        st[f"blocks_{i}"] = (
            jnp.zeros((B2, arena, inner)),
            jnp.zeros((B2, arena, inner)),
        )
    return st


class DiTEstimator(nn.Module):
    """Drop-in estimator with the (x, mask, mu, t, spks, cond) interface."""

    cfg: DiTConfig = DiTConfig()

    @nn.compact
    def __call__(self, x, mask, mu, t, spks, cond, streaming: bool = False, stream=None):
        """x/mu/cond: [B, T, 80]; mask: [B, T] float; t: [B]; spks: [B, 80].

        stream=(state, pos, real_n): incremental-chunk mode (see
        ConditionalDecoder) — x/mu/cond are the new chunk only; returns
        (field, new_state)."""
        c = self.cfg
        B, T, _ = x.shape
        t_emb = DiTTimestepEmbedding(c.dim, c.freq_embed_dim, name="time_embed")(t)

        spk_b = jnp.broadcast_to(spks[:, None, :], (B, T, spks.shape[-1]))
        h = nn.Dense(c.dim, name="input_proj")(jnp.concatenate([x, cond, mu, spk_b], axis=-1))

        if stream is not None:
            st, pos, real_n = stream
            st = dict(st)
            A = st["blocks_0"][0].shape[1]
            m = jnp.arange(T)[None, :] < real_n
            hc, st["conv_pos"] = CausalConvPositionEmbedding(c.dim, name="conv_pos")(
                h, jnp.broadcast_to(m, (B, T)), st["conv_pos"], real_n
            )
            h = hc + h
            i_q = jnp.arange(T)[None, :, None]
            s_k = jnp.arange(A)[None, None, :]
            keep = s_k < jnp.minimum(pos + real_n, ((pos + i_q) // c.static_chunk_size + 1) * c.static_chunk_size)
            am = jnp.broadcast_to(keep, (B, T, A))
            for i in range(c.depth):
                h, st[f"blocks_{i}"] = DiTBlock(c, name=f"blocks_{i}")(h, t_emb, am, st[f"blocks_{i}"], pos)
            mod = nn.Dense(c.dim * 2, name="final_adaln")(jax.nn.silu(t_emb))
            scale, shift = jnp.split(mod, 2, axis=-1)
            h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, name="norm_out")(h)
            h = h * (1 + scale)[:, None, :] + shift[:, None, :]
            out = nn.Dense(c.mel_dim, name="proj_out")(h)
            return out * m[..., None], st

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
