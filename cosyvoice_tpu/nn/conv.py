"""1D convolution family, channel-last [B, T, C] (TPU/XLA native layout).

Includes the streaming-causal variants the reference vocoder/flow rely on
(cosyvoice/transformer/convolution.py:149-259, flow/decoder.py:36-62) and the
conformer ConvolutionModule (convolution.py:25-146). Weight-normalized convs
(torch weight_norm dim=0) are provided for HiFT checkpoint/training parity.

Causal padding convention (matches reference): `causal_padding = (k-1)*d`,
entirely on the left ('left') or right ('right'); an optional `cache` of
exactly `causal_padding` frames replaces the zero padding for streaming.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _conv1d(x, kernel, stride=1, dilation=1, groups=1, padding="VALID"):
    """x: [B, T, Cin], kernel: [k, Cin//groups, Cout] -> [B, T', Cout]."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else [padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


class Conv1d(nn.Module):
    """Plain conv, torch-Conv1d compatible: symmetric zero pad `padding`.

    `dtype` (optional) casts input+kernel for MXU-friendly bf16 compute while
    params stay fp32."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1] // self.groups, self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        if self.padding:
            x = jnp.pad(x, ((0, 0), (self.padding, self.padding), (0, 0)))
        y = _conv1d(x, kernel, self.stride, self.dilation, self.groups)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype is not None else bias)
        return y


class WNConv1d(nn.Module):
    """Weight-normalized conv (torch weight_norm dim=0): w = g * v/||v||_(k,in)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        v = self.param(
            "v",
            nn.initializers.normal(0.01),
            (self.kernel_size, x.shape[-1] // self.groups, self.features),
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True) + 1e-12)
        kernel = v * (g[None, None, :] / norm)
        if self.padding:
            x = jnp.pad(x, ((0, 0), (self.padding, self.padding), (0, 0)))
        y = _conv1d(x, kernel, self.stride, self.dilation, self.groups)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized ConvTranspose1d (torch semantics).

    out_len = (T-1)*stride - 2*padding + kernel_size. Implemented as an
    lhs-dilated conv with a flipped kernel so XLA maps it onto the MXU.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        v = self.param("v", nn.initializers.normal(0.01), (self.kernel_size, in_ch, self.features))
        # torch weight_norm(ConvTranspose1d, dim=0): weight is [in, out, k], so
        # g has one entry per INPUT channel; norm over (k, out) per in channel.
        g = self.param("g", nn.initializers.ones, (in_ch,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True) + 1e-12)
        kernel = v * (g[None, :, None] / norm)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + self.param("bias", nn.initializers.zeros, (self.features,))


def roll_cache(cache: jax.Array, x: jax.Array, real_n) -> jax.Array:
    """Advance a causal-conv left-context cache past a chunk.

    cache: [B, P, C] frames left of the chunk; x: [B, n, C] the chunk INPUT
    (tail beyond real_n may be padding). Returns the P frames ending at the
    REAL boundary: concat(cache, x)[:, real_n : real_n + P] — i.e.
    x[real_n-P : real_n], reaching back into the old cache when real_n < P.
    """
    buf = jnp.concatenate([cache, x.astype(cache.dtype)], axis=1)
    return jax.lax.dynamic_slice_in_dim(buf, real_n, cache.shape[1], axis=1)


class CausalConv1d(nn.Module):
    """One-sided conv with (k-1)*d pad on the left or right.

    Optional `cache` ([B, causal_padding, C]) replaces the zero pad for
    streaming (reference: transformer/convolution.py:150-188). Supports
    weight norm for the vocoder variants.
    """

    features: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1
    causal_type: str = "left"
    weight_norm: bool = False

    @property
    def causal_padding(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    @nn.compact
    def __call__(self, x: jax.Array, cache: Optional[jax.Array] = None) -> jax.Array:
        conv_cls = WNConv1d if self.weight_norm else Conv1d
        conv = conv_cls(
            self.features, self.kernel_size, dilation=self.dilation, groups=self.groups, name="conv"
        )
        pad = self.causal_padding
        if cache is None:
            cache = jnp.zeros((x.shape[0], pad, x.shape[-1]), x.dtype)
        assert cache.shape[1] == pad, f"cache must hold {pad} frames"
        if self.causal_type == "left":
            x = jnp.concatenate([cache, x], axis=1)
        else:
            x = jnp.concatenate([x, cache], axis=1)
        return conv(x)


class CausalConv1dDownSample(nn.Module):
    """Strided causal conv (reference: transformer/convolution.py:190-216).

    Left pad = stride-1 (zeros or cache); kernel_size % stride == 0, so
    out_len = in_len // stride.
    """

    features: int
    kernel_size: int
    stride: int
    weight_norm: bool = True

    @property
    def causal_padding(self) -> int:
        return self.stride - 1

    @nn.compact
    def __call__(self, x: jax.Array, cache: Optional[jax.Array] = None) -> jax.Array:
        assert self.kernel_size % self.stride == 0
        if cache is None:
            cache = jnp.zeros((x.shape[0], self.causal_padding, x.shape[-1]), x.dtype)
        x = jnp.concatenate([cache, x], axis=1)
        conv_cls = WNConv1d if self.weight_norm else Conv1d
        return conv_cls(self.features, self.kernel_size, stride=self.stride, name="conv")(x)


class CausalConv1dUpsample(nn.Module):
    """Nearest-upsample x stride, then left-causal conv (kernel_size-1 pad).

    Reference: transformer/convolution.py:226-259 — the streaming-safe
    replacement for ConvTranspose1d in CausalHiFT.
    """

    features: int
    kernel_size: int
    stride: int
    weight_norm: bool = True

    @property
    def causal_padding(self) -> int:
        return self.kernel_size - 1

    @nn.compact
    def __call__(self, x: jax.Array, cache: Optional[jax.Array] = None) -> jax.Array:
        x = jnp.repeat(x, self.stride, axis=1)
        if cache is None:
            cache = jnp.zeros((x.shape[0], self.causal_padding, x.shape[-1]), x.dtype)
        x = jnp.concatenate([cache, x], axis=1)
        conv_cls = WNConv1d if self.weight_norm else Conv1d
        return conv_cls(self.features, self.kernel_size, name="conv")(x)


class ConvolutionModule(nn.Module):
    """Conformer convolution module (pointwise-GLU / depthwise / norm / Swish /
    pointwise), reference transformer/convolution.py:25-146.

    x: [B, T, C]; pad_mask: [B, T] bool (True = valid). Causal mode keeps a
    left-context cache of lorder=k-1 frames, threaded explicitly.
    """

    channels: int
    kernel_size: int = 15
    causal: bool = False
    norm: str = "layer_norm"

    @nn.compact
    def __call__(self, x, pad_mask=None, cache=None):
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        x = Conv1d(2 * self.channels, 1, name="pointwise_conv1")(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU

        lorder = self.kernel_size - 1 if self.causal else 0
        new_cache = None
        if self.causal:
            if cache is None:
                cache = jnp.zeros((x.shape[0], lorder, self.channels), x.dtype)
            x = jnp.concatenate([cache, x], axis=1)
            new_cache = x[:, -lorder:]
            x = Conv1d(self.channels, self.kernel_size, groups=self.channels, name="depthwise_conv")(x)
        else:
            x = Conv1d(
                self.channels,
                self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                groups=self.channels,
                name="depthwise_conv",
            )(x)
        assert self.norm == "layer_norm", "batch_norm conv module not used by any shipped config"
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = x * jax.nn.sigmoid(x)  # swish
        x = Conv1d(self.channels, 1, name="pointwise_conv2")(x)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        return x, new_cache
