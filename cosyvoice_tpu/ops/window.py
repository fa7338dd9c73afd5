"""Cross-fade windows for chunked streaming synthesis.

Mirrors the reference's hamming fade_in_out (cosyvoice/utils/common.py:170-178,
cli/model.py:46,51,267): the head of the new chunk is blended with the tail of
the previous chunk using the two halves of a hamming window of length
2*overlap.
"""

import jax
import jax.numpy as jnp
import numpy as np


def hamming_window(n: int, dtype=jnp.float32) -> jax.Array:
    """np.hamming(n) (symmetric)."""
    return jnp.asarray(np.hamming(n), dtype=dtype)


def fade_in_out(fade_in: jax.Array, fade_out_tail: jax.Array, window: jax.Array) -> jax.Array:
    """Blend the first `overlap` samples of fade_in with fade_out_tail.

    fade_in: [..., T] new chunk (T >= overlap)
    fade_out_tail: [..., overlap] tail of the previous chunk
    window: [2*overlap]
    """
    overlap = window.shape[0] // 2
    head = fade_in[..., :overlap] * window[:overlap] + fade_out_tail * window[overlap:]
    return jnp.concatenate([head, fade_in[..., overlap:]], axis=-1)
