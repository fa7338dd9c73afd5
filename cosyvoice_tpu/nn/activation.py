"""Activations used across the stack (VPU element-wise, fused by XLA)."""

import flax.linen as nn
import jax
import jax.numpy as jnp


def mish(x: jax.Array) -> jax.Array:
    return x * jnp.tanh(jax.nn.softplus(x))


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation x + sin^2(alpha*x)/alpha (BigVGAN/HiFT).

    Matches reference cosyvoice/transformer/activation.py:Snake with
    alpha_logscale=False. x: [..., C]; alpha: [C] trainable.
    """
    return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(x * alpha))


class Snake(nn.Module):
    """Channel-wise trainable snake over the last axis."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,))
        return snake(x, alpha)
