"""Time-axis resampling ops matching torch F.interpolate semantics.

Used by: HiFT f0 upsampler (nearest, torch.nn.Upsample default —
hifigan/generator.py:424), SineGen2 phase resampling (linear,
align_corners=False — generator.py:251-257), speed control
(F.interpolate(mode='linear') on mel — cli/model.py:169,322) and the v1
length regulator (flow/length_regulator.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def repeat_interleave_time(x: jax.Array, factor: int, axis: int = -1) -> jax.Array:
    """Nearest-neighbour integer upsampling (== F.interpolate(mode='nearest', scale=factor))."""
    return jnp.repeat(x, factor, axis=axis)


def interpolate_nearest(x: jax.Array, out_len: int) -> jax.Array:
    """F.interpolate(mode='nearest') on the last axis to arbitrary out_len."""
    in_len = x.shape[-1]
    src = jnp.floor(jnp.arange(out_len) * (in_len / out_len)).astype(jnp.int32)
    return x[..., jnp.clip(src, 0, in_len - 1)]


@partial(jax.jit, static_argnames=("out_len",))
def interpolate_linear(x: jax.Array, out_len: int) -> jax.Array:
    """F.interpolate(mode='linear', align_corners=False) on the last axis."""
    in_len = x.shape[-1]
    scale = in_len / out_len
    # torch align_corners=False: src = (dst + 0.5) * scale - 0.5
    src = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_len - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    w = (src - lo.astype(jnp.float32)).astype(x.dtype)
    return x[..., lo] * (1 - w) + x[..., hi] * w
