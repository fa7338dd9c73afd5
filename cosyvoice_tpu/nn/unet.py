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
    """CausalConv + LayerNorm + Mish (flow/decoder.py:65-78)."""

    dim_out: int

    @nn.compact
    def __call__(self, x, mask):
        x = CausalConv1d(self.dim_out, 3, name="conv")(x * mask[..., None])
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return mish(x) * mask[..., None]


class ResnetBlock1D(nn.Module):
    dim_out: int
    groups: int = 8
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask, t_emb):
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
    """diffusers-style attention: qkv no bias, out proj with bias."""

    heads: int
    head_dim: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, attn_bias=None):
        B, T, C = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x).reshape(B, T, self.heads, self.head_dim)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x).reshape(B, T, self.heads, self.head_dim)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x).reshape(B, T, self.heads, self.head_dim)
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) / np.sqrt(self.head_dim)
        if attn_bias is not None:
            scores = scores + attn_bias[:, None, :, :].astype(jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, inner)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """Self-attention + FFN block (Matcha BasicTransformerBlock, act 'gelu').

    attn_bias: additive float mask [B, T, T] (built via ops.masks.mask_to_bias).
    """

    num_heads: int
    head_dim: int
    ff_mult: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, attn_bias=None):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + _UNetAttention(self.num_heads, self.head_dim, dtype=self.dtype, name="attn1")(h, attn_bias).astype(x.dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = nn.Dense(x.shape[-1] * self.ff_mult, dtype=self.dtype, name="ff_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(x.shape[-1], dtype=self.dtype, name="ff_out")(h).astype(x.dtype)
        return x
