"""Matcha-style 1D U-Net building blocks (JAX, channel-last).

Native re-implementation of the vendored Matcha-TTS components the reference
imports (SURVEY §2.2): Block1D/ResnetBlock1D/Downsample1D/Upsample1D/
TimestepEmbedding/BasicTransformerBlock (flow/decoder.py:21-22) plus the
causal variants defined in cosyvoice/flow/decoder.py:36-85.

x: [B, T, C]; mask: [B, T] float (1 inside sequence); t_emb: [B, time_dim].
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.activation import mish
from cosyvoice_tpu.nn.conv import Conv1d, CausalConv1d, WNConvTranspose1d


class Block1D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask):
        x = Conv1d(self.dim_out, 3, padding=1, name="conv")(x * mask[..., None])
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(x)
        return mish(x) * mask[..., None]


class CausalBlock1D(nn.Module):
    """CausalConv + LayerNorm + Mish (flow/decoder.py:65-78).

    cache/real_n: incremental-chunk mode — `cache` [B, 2, C] holds the two
    masked input frames left of the chunk; returns (y, new_cache)."""

    dim_out: int

    @nn.compact
    def __call__(self, x, mask, cache=None, real_n=None):
        from cosyvoice_tpu.nn.conv import roll_cache

        xm = x * mask[..., None]
        if cache is None:
            x = CausalConv1d(self.dim_out, 3, name="conv")(xm)
            new_cache = None
        else:
            x = CausalConv1d(self.dim_out, 3, name="conv")(xm, cache=cache)
            new_cache = roll_cache(cache, xm, real_n)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        y = mish(x) * mask[..., None]
        return y if cache is None else (y, new_cache)


class ResnetBlock1D(nn.Module):
    dim_out: int
    groups: int = 8
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask, t_emb, caches=None, real_n=None):
        """caches: (cache_block1, cache_block2) for incremental-chunk mode
        (causal only); returns (y, new_caches) when given."""
        if caches is not None:
            assert self.causal
            h, c1 = CausalBlock1D(self.dim_out, name="block1")(x, mask, caches[0], real_n)
            h = h + nn.Dense(self.dim_out, name="mlp")(mish(t_emb))[:, None, :]
            h, c2 = CausalBlock1D(self.dim_out, name="block2")(h, mask, caches[1], real_n)
            y = h + Conv1d(self.dim_out, 1, name="res_conv")(x * mask[..., None])
            return y, (c1, c2)
        block_cls = (lambda name: CausalBlock1D(self.dim_out, name=name)) if self.causal else (
            lambda name: Block1D(self.dim_out, self.groups, name=name)
        )
        h = block_cls("block1")(x, mask)
        h = h + nn.Dense(self.dim_out, name="mlp")(mish(t_emb))[:, None, :]
        h = block_cls("block2")(h, mask)
        return h + Conv1d(self.dim_out, 1, name="res_conv")(x * mask[..., None])


class Downsample1D(nn.Module):
    """Strided conv downsample (factor 2), torch Conv1d(dim, dim, 3, 2, 1)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return Conv1d(self.dim, 3, stride=2, padding=1, name="conv")(x)


class Upsample1DTranspose(nn.Module):
    """ConvTranspose1d(dim, dim, 4, 2, 1) upsample (factor 2)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return WNConvTranspose1d(self.dim, 4, 2, padding=1, name="conv")(x)


class TimestepEmbedding(nn.Module):
    time_embed_dim: int

    @nn.compact
    def __call__(self, t):
        t = nn.Dense(self.time_embed_dim, name="linear_1")(t)
        t = jax.nn.silu(t)
        return nn.Dense(self.time_embed_dim, name="linear_2")(t)


class _UNetAttention(nn.Module):
    """diffusers-style attention: qkv no bias, out proj with bias.

    Chunked mode (`arena`): x is the new chunk [B, n, C]; K/V rows are written
    into the fixed arena [B, A, inner] at [pos, pos+n) and attention runs over
    the whole arena under `attn_bias` [B, n, A]. Bit-equal to full recompute
    under chunk-causal masks (K/V of a position depend only on its own input).
    """

    heads: int
    head_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, attn_bias=None, arena=None, pos=None):
        B, T, C = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        new_arena = None
        if arena is not None:
            k_arena, v_arena = arena
            k_arena = jax.lax.dynamic_update_slice(k_arena, k.astype(k_arena.dtype), (0, pos, 0))
            v_arena = jax.lax.dynamic_update_slice(v_arena, v.astype(v_arena.dtype), (0, pos, 0))
            new_arena = (k_arena, v_arena)
            k = k_arena.astype(q.dtype)
            v = v_arena
        S = k.shape[1]
        q = q.reshape(B, T, self.heads, self.head_dim)
        k = k.reshape(B, S, self.heads, self.head_dim)
        v = v.reshape(B, S, self.heads, self.head_dim)
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / np.sqrt(self.head_dim)
        if attn_bias is not None:
            scores = scores + attn_bias[:, None, :, :].astype(jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, inner)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return out if arena is None else (out, new_arena)


class BasicTransformerBlock(nn.Module):
    """Self-attention + FFN block (Matcha BasicTransformerBlock, act 'gelu').

    attn_bias: additive float mask [B, T, T] (built via ops.masks.mask_to_bias),
    or [B, n, A] in chunked mode (arena/pos given).
    """

    num_heads: int
    head_dim: int
    ff_mult: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, attn_bias=None, arena=None, pos=None):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        a = _UNetAttention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn1")(h, attn_bias, arena, pos)
        new_arena = None
        if arena is not None:
            a, new_arena = a
        x = x + a.astype(x.dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = nn.Dense(x.shape[-1] * self.ff_mult, dtype=self.dtype, name="ff_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h).astype(x.dtype)
        return x if arena is None else (x, new_arena)
