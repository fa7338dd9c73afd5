"""Positional encodings: espnet relative PE, sinusoidal timestep emb, RoPE.

EspnetRelPositionalEncoding reproduces the reference's symmetric +/-(L-1)
table and streaming slice (cosyvoice/transformer/embedding.py:201-302); the
table is built host-side once and sliced with static shapes under jit.
"""

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _espnet_pe_table(max_len: int, d_model: int) -> np.ndarray:
    """[1, 2*max_len-1, d] — positive positions reversed then negative from 1."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((max_len, d_model))
    pe_neg = np.zeros((max_len, d_model))
    pe_pos[:, 0::2] = np.sin(position * div_term)
    pe_pos[:, 1::2] = np.cos(position * div_term)
    pe_neg[:, 0::2] = np.sin(-position * div_term)
    pe_neg[:, 1::2] = np.cos(-position * div_term)
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)
    return pe[None].astype(np.float32)


class EspnetRelPositionalEncoding:
    """Stateless helper (not a Module — the table has no trainable params).

    The table lives HOST-side and grows on demand (the espnet reference's
    extend_pe): `position_encoding` slices it with trace-time-static
    offset/size, so under jit each distinct length folds into one program
    constant of exactly 2*(size+offset)-1 rows — no multi-MB full-range
    table is ever uploaded."""

    def __init__(self, d_model: int, max_len: int = 5000):
        self.d_model = d_model
        self.max_len = max_len
        self.xscale = math.sqrt(d_model)
        self._pe_np = _espnet_pe_table(max_len, d_model)

    def __call__(self, x: jax.Array, offset: int = 0) -> Tuple[jax.Array, jax.Array]:
        """x: [B, T, D] -> (x * sqrt(d), pos_emb [1, 2T-1, D])."""
        return x * self.xscale, self.position_encoding(offset, x.shape[1])

    def position_encoding(self, offset: int, size: int) -> jax.Array:
        assert isinstance(size, int) and isinstance(offset, int), (
            "relative-PE slicing requires trace-time-static offset/size"
        )
        if size + offset > self._pe_np.shape[1] // 2 + 1:
            grow = self.max_len
            while size + offset > grow:
                grow *= 2
            self.max_len = grow
            self._pe_np = _espnet_pe_table(grow, self.d_model)
        center = self._pe_np.shape[1] // 2
        start = center - size - offset + 1
        return jnp.asarray(self._pe_np[:, start : start + 2 * (size + offset) - 1])


class SinusoidalPosEmb:
    """Matcha SinusoidalPosEmb for CFM timesteps: t [B] -> [B, dim].

    half = dim//2; emb = t*1000 * exp(-ln(10000)*i/(half-1)); [sin, cos].
    """

    def __init__(self, dim: int):
        assert dim % 2 == 0
        self.dim = dim

    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.dim // 2
        emb = math.log(10000.0) / (half - 1)
        emb = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
        emb = t[:, None] * 1000.0 * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def rope_frequencies(head_dim: int, max_len: int, theta: float = 1e6) -> Tuple[jax.Array, jax.Array]:
    """Precompute cos/sin tables [max_len, head_dim//2]."""
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    return jnp.asarray(np.cos(freqs), jnp.float32), jnp.asarray(np.sin(freqs), jnp.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (HF 'half-split' layout): x [..., T, H, D], cos/sin [T, D/2]."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def apply_rope_batched(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Per-row positions (ragged batches): x [B, T, H, D], cos/sin [B, T, D/2]."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
