"""CAM++ (D-TDNN) speaker-embedding model in JAX.

Replaces `campplus.onnx` (reference cli/frontend.py:45,108-118): input is
80-dim kaldi fbank with CMN, output a 192-d x-vector. Structure follows the
public CAM++ design: 2D-conv front-end (FCM), densely connected TDNN blocks
with context-aware masking, and global statistics pooling -> 192-d linear.

Weight conversion from the released ONNX graph is a planned activation-match
step; dims are kept compatible (input 80, output 192).
"""

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosyvoice_tpu.nn.conv import Conv1d


@dataclass(frozen=True)
class CamPPConfig:
    feat_dim: int = 80
    embed_dim: int = 192
    channels: int = 512
    num_blocks: int = 3
    growth: int = 128


class _TDNNLayer(nn.Module):
    out_ch: int
    kernel: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) * self.dilation // 2
        h = Conv1d(self.out_ch, self.kernel, padding=pad, dilation=self.dilation, name="conv")(x)
        h = nn.BatchNorm(use_running_average=True, name="bn")(h)
        return jax.nn.relu(h)


class _CAMDenseBlock(nn.Module):
    """Densely-connected TDNN sub-block with context-aware channel masking."""

    growth: int
    num_layers: int = 4
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(self.num_layers):
            h = jnp.concatenate(feats, axis=-1)
            h = _TDNNLayer(self.growth, 3, self.dilation, name=f"tdnn_{i}")(h)
            # context-aware mask: sigmoid gate from segment + global context
            g = jnp.mean(h, axis=1, keepdims=True)
            gate = jax.nn.sigmoid(nn.Dense(self.growth, name=f"cam_{i}")(g))
            feats.append(h * gate)
        return jnp.concatenate(feats, axis=-1)


class CamPPEmbedding(nn.Module):
    cfg: CamPPConfig = CamPPConfig()

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        """feats: [B, T, 80] CMN'd kaldi fbank -> [B, 192] x-vector."""
        c = self.cfg
        # FCM front-end: treat fbank as 2D image, conv over (T, F)
        x = feats[..., None]  # [B, T, F, 1]
        for i, ch in enumerate((32, 32)):
            x = nn.Conv(ch, (3, 3), strides=(1, 2), padding="SAME", name=f"fcm_{i}")(x)
            x = jax.nn.relu(nn.BatchNorm(use_running_average=True, name=f"fcm_bn_{i}")(x))
        B, T, F2, C2 = x.shape
        x = x.reshape(B, T, F2 * C2)

        x = _TDNNLayer(c.channels, 5, 1, name="tdnn_in")(x)
        for i in range(c.num_blocks):
            x = _CAMDenseBlock(c.growth, dilation=2**i, name=f"block_{i}")(x)
            x = _TDNNLayer(c.channels, 1, 1, name=f"transit_{i}")(x)

        mean = jnp.mean(x, axis=1)
        std = jnp.sqrt(jnp.clip(jnp.var(x, axis=1), 1e-7))
        stats = jnp.concatenate([mean, std], axis=-1)
        h = nn.Dense(c.embed_dim, name="embed")(stats)
        return h
