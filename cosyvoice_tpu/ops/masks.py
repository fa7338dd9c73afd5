"""Padding / chunk mask utilities (XLA, static shapes).

Semantics follow the reference mask machinery (cosyvoice/utils/mask.py:
make_pad_mask :161+, subsequent_chunk_mask :154-158 — the ONNX-exportable
rewrite that ignores num_left_chunks, and add_optional_chunk_mask :161-236)
but are expressed with broadcasted iota so they trace to constant-shape XLA.
"""

import jax
import jax.numpy as jnp


def make_non_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] lengths -> [B, max_len] bool, True inside the sequence."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def make_pad_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    return ~make_non_pad_mask(lengths, max_len)


def subsequent_chunk_mask(size: int, chunk_size: int) -> jax.Array:
    """[size, size] bool: position i attends to j iff j < (i//chunk+1)*chunk.

    Matches the reference's export-friendly rewrite (utils/mask.py:154-158):
    all left chunks visible, no left-context limit.
    """
    i = jnp.arange(size)[:, None]
    j = jnp.arange(size)[None, :]
    return j < (i // chunk_size + 1) * chunk_size


def add_optional_chunk_mask(
    pad_mask: jax.Array,
    static_chunk_size: int,
) -> jax.Array:
    """Combine [B, 1, T] non-pad mask with a static chunk mask.

    static_chunk_size <= 0 means full (non-causal) attention — returns the pad
    mask broadcast to [B, T, T] like the reference's `masks & chunk_masks`.
    """
    T = pad_mask.shape[-1]
    if static_chunk_size > 0:
        chunk = subsequent_chunk_mask(T, static_chunk_size)[None]
        return pad_mask & chunk
    return jnp.broadcast_to(pad_mask, (pad_mask.shape[0], T, T))


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool mask -> additive attention bias (0 keep / -1e10 drop).

    Same constant as the reference (utils/common.py:mask_to_bias) to preserve
    numerics parity.
    """
    return (1.0 - mask.astype(dtype)) * jnp.asarray(-1.0e10, dtype=dtype)
