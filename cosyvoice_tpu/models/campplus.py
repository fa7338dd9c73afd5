"""CAM++ (D-TDNN) speaker-embedding model in JAX.

Replaces `campplus.onnx` (reference cli/frontend.py:45,108-118): input is
80-dim kaldi fbank with CMN, output a 192-d x-vector. The graph follows the
public CAM++ architecture (3D-Speaker `speakerlab` CAMPPlus — the module the
reference's campplus.onnx is exported from) exactly, so released weights
convert one-to-one via tools/convert_checkpoint.convert_campplus:

  head (FCM): 2D-conv front-end over (freq, time) — conv1+bn1, two residual
    stages of BasicResBlock (freq stride 2 each), conv2+bn2 (freq stride 2);
    80 mel bins -> 10, channels 32 -> flattened 320-ch 1D sequence.
  xvector: TDNN (k=5, time stride 2) -> three CAM-dense-TDNN blocks
    (12/24/16 layers, growth 32, bottleneck 128, dilations 1/2/2), each
    followed by a transit layer halving channels -> BN+ReLU -> global
    mean/std statistics pooling -> 1x1 linear to 192 + affine-less BN.

All BatchNorms run in eval mode (running stats as params). Everything is
channels-last [B, T, C] for TPU-native convs.
"""

from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosyvoice_tpu.nn.conv import Conv1d


@dataclass(frozen=True)
class CamPPConfig:
    feat_dim: int = 80
    embed_dim: int = 192
    m_channels: int = 32
    init_channels: int = 128
    growth_rate: int = 32
    bn_size: int = 4  # bottleneck = bn_size * growth_rate
    # (num_layers, kernel_size, dilation) per dense block
    blocks: Tuple[Tuple[int, int, int], ...] = ((12, 3, 1), (24, 3, 2), (16, 3, 2))
    seg_len: int = 100  # CAM segment pooling window (frames)


class _BN(nn.Module):
    """Eval-mode BatchNorm with running stats stored as params (torch eps)."""

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            y = y * self.param("scale", nn.initializers.ones, (c,))
            y = y + self.param("bias", nn.initializers.zeros, (c,))
        return y


class _FCMResBlock(nn.Module):
    """BasicResBlock: 3x3 convs, stride applied to the freq dim only."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):  # x: [B, F, T, C]
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        h = jax.nn.relu(_BN(name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        h = _BN(name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1),
                        use_bias=False, name="shortcut_conv")(x)
            x = _BN(name="shortcut_bn")(x)
        return jax.nn.relu(h + x)


class _FCM(nn.Module):
    """Front-end convolution module: fbank as a 2D image, freq downsample 8x."""

    m_channels: int = 32

    @nn.compact
    def __call__(self, feats):  # feats: [B, T, F] -> [B, T, C*F/8]
        x = jnp.transpose(feats, (0, 2, 1))[..., None]  # [B, F, T, 1]
        x = nn.Conv(self.m_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv1")(x)
        x = jax.nn.relu(_BN(name="bn1")(x))
        x = _FCMResBlock(self.m_channels, stride=2, name="layer1_0")(x)
        x = _FCMResBlock(self.m_channels, stride=1, name="layer1_1")(x)
        x = _FCMResBlock(self.m_channels, stride=2, name="layer2_0")(x)
        x = _FCMResBlock(self.m_channels, stride=1, name="layer2_1")(x)
        x = nn.Conv(self.m_channels, (3, 3), strides=(2, 1),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(x)
        x = jax.nn.relu(_BN(name="bn2")(x))
        # torch: (B, C, F', T).view(B, C*F', T) — index c*F'+f
        B, Fq, T, C = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(B, T, C * Fq)
        return x


def _seg_pooling(x, seg_len):
    """torch avg_pool1d(kernel=stride=seg_len, ceil_mode=True) + nearest
    re-expand, truncated to T. Trailing partial segment averages over its
    actual element count (ceil_mode clips the window)."""
    B, T, C = x.shape
    n_seg = -(-T // seg_len)
    pad = n_seg * seg_len - T
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(B, n_seg, seg_len, C).sum(axis=2)
    counts = jnp.minimum(seg_len, T - jnp.arange(n_seg) * seg_len).astype(x.dtype)
    seg = sums / counts[None, :, None]
    out = jnp.repeat(seg, seg_len, axis=1)[:, :T]
    return out


class _CAMLayer(nn.Module):
    """Context-aware mask: local conv output gated by sigmoid(context MLP)."""

    out_ch: int
    kernel: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):  # [B, T, Cbn]
        pad = (self.kernel - 1) // 2 * self.dilation
        y = Conv1d(self.out_ch, self.kernel, padding=pad, dilation=self.dilation,
                   use_bias=False, name="linear_local")(x)
        context = jnp.mean(x, axis=1, keepdims=True) + _seg_pooling(x, self.seg_len)
        context = jax.nn.relu(
            Conv1d(x.shape[-1] // self.reduction, 1, name="linear1")(context))
        m = jax.nn.sigmoid(Conv1d(self.out_ch, 1, name="linear2")(context))
        return y * m


class _CAMDenseTDNNLayer(nn.Module):
    growth: int
    bn_channels: int
    kernel: int
    dilation: int
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(_BN(name="nonlinear1_bn")(x))
        h = Conv1d(self.bn_channels, 1, use_bias=False, name="linear1")(h)
        h = jax.nn.relu(_BN(name="nonlinear2_bn")(h))
        return _CAMLayer(self.growth, self.kernel, self.dilation,
                         seg_len=self.seg_len, name="cam_layer")(h)


class _CAMDenseTDNNBlock(nn.Module):
    """Densely connected: each layer consumes the running concat."""

    num_layers: int
    growth: int
    bn_channels: int
    kernel: int
    dilation: int
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            h = _CAMDenseTDNNLayer(self.growth, self.bn_channels, self.kernel,
                                   self.dilation, self.seg_len,
                                   name=f"tdnnd{i + 1}")(x)
            x = jnp.concatenate([x, h], axis=-1)
        return x


class CamPPEmbedding(nn.Module):
    cfg: CamPPConfig = field(default_factory=CamPPConfig)

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        """feats: [B, T, 80] CMN'd kaldi fbank -> [B, 192] x-vector."""
        c = self.cfg
        x = _FCM(c.m_channels, name="head")(feats)

        # xvector.tdnn: k=5, time stride 2, pad 2, then BN+ReLU
        x = Conv1d(c.init_channels, 5, stride=2, padding=2, use_bias=False,
                   name="tdnn_linear")(x)
        x = jax.nn.relu(_BN(name="tdnn_bn")(x))

        channels = c.init_channels
        for i, (num_layers, kernel, dilation) in enumerate(c.blocks):
            x = _CAMDenseTDNNBlock(
                num_layers, c.growth_rate, c.bn_size * c.growth_rate, kernel,
                dilation, c.seg_len, name=f"block{i + 1}")(x)
            channels += num_layers * c.growth_rate
            # transit: BN+ReLU then 1x1 conv halving channels
            x = jax.nn.relu(_BN(name=f"transit{i + 1}_bn")(x))
            x = Conv1d(channels // 2, 1, use_bias=False,
                       name=f"transit{i + 1}_linear")(x)
            channels //= 2

        x = jax.nn.relu(_BN(name="out_bn")(x))

        # statistics pooling: mean + unbiased std over time (torch std ddof=1)
        mean = jnp.mean(x, axis=1)
        n = x.shape[1]
        var = jnp.sum(jnp.square(x - mean[:, None, :]), axis=1) / jnp.maximum(n - 1, 1)
        stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)

        # dense: 1x1 linear (no bias) + affine-less BN
        h = Conv1d(c.embed_dim, 1, use_bias=False, name="dense_linear")(stats[:, None, :])
        h = _BN(affine=False, name="dense_bn")(h)
        return h[:, 0, :]
