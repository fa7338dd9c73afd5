"""Flow-matching estimator: Matcha-style 1D U-Net (causal + non-causal).

Re-design of cosyvoice/flow/decoder.py:88-494 in channel-last JAX. The
estimator maps (x_t, mu, spks, cond, t) -> vector field, with chunked
attention masks for streaming (static_chunk_size mel frames).

Differences from the reference, deliberate and TPU-motivated:
- GroupNorm in the non-causal blocks is computed over valid (unmasked)
  positions only, making bucketed/padded inference length-invariant (the
  reference normalizes over padded time; with an all-ones mask the two
  coincide, so converted checkpoints behave identically on unpadded input).
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosyvoice_tpu.nn.conv import CausalConv1d, Conv1d
from cosyvoice_tpu.nn.embedding import SinusoidalPosEmb
from cosyvoice_tpu.nn.unet import (
    BasicTransformerBlock,
    Block1D,
    CausalBlock1D,
    Downsample1D,
    ResnetBlock1D,
    TimestepEmbedding,
    Upsample1DTranspose,
)
from cosyvoice_tpu.ops.masks import mask_to_bias, subsequent_chunk_mask


@dataclass(frozen=True)
class EstimatorConfig:
    in_channels: int = 320  # pack(x, mu, spks, cond) = 80*3 + 80
    out_channels: int = 80
    channels: Tuple[int, ...] = (256,)
    attention_head_dim: int = 64
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8
    act_fn: str = "gelu"
    static_chunk_size: int = 50  # mel frames (= chunk_size * token_mel_ratio)
    causal: bool = True
    dtype: object = None  # bf16 compute for the transformer blocks


def _attn_bias(mask: jax.Array, streaming: bool, chunk: int) -> jax.Array:
    """mask: [B, T] float -> additive bias [B, T, T]."""
    pad = mask > 0.5
    m = pad[:, None, :]
    if streaming:
        m = m & subsequent_chunk_mask(mask.shape[1], chunk)[None]
    else:
        m = jnp.broadcast_to(m, (mask.shape[0], mask.shape[1], mask.shape[1]))
    return mask_to_bias(m)


class ConditionalDecoder(nn.Module):
    cfg: EstimatorConfig = EstimatorConfig()

    @nn.compact
    def __call__(self, x, mask, mu, t, spks, cond, streaming: bool = False):
        """x/mu/cond: [B, T, 80]; mask: [B, T] float; t: [B]; spks: [B, 80].

        Returns the estimated vector field [B, T, 80].
        """
        cfg = self.cfg
        t_emb = SinusoidalPosEmb(cfg.in_channels)(t)
        t_emb = TimestepEmbedding(cfg.channels[0] * 4, name="time_mlp")(t_emb)

        h = jnp.concatenate(
            [x, mu, jnp.broadcast_to(spks[:, None, :], (x.shape[0], x.shape[1], spks.shape[-1])), cond], axis=-1
        )

        def resnet(dim_out, name):
            return ResnetBlock1D(dim_out=dim_out, causal=cfg.causal, name=name)

        def tblocks(name):
            return [
                BasicTransformerBlock(cfg.num_heads, cfg.attention_head_dim, dtype=cfg.dtype, name=f"{name}_{j}")
                for j in range(cfg.n_blocks)
            ]

        hiddens = []
        masks = [mask]
        # ---- down path ----
        for i, ch in enumerate(cfg.channels):
            m = masks[-1]
            bias = _attn_bias(m, streaming, cfg.static_chunk_size)
            h = resnet(ch, f"down_resnet_{i}")(h, m, t_emb)
            for blk in tblocks(f"down_tf_{i}"):
                h = blk(h, bias)
            hiddens.append(h)
            is_last = i == len(cfg.channels) - 1
            if is_last:
                if cfg.causal:
                    h = CausalConv1d(ch, 3, name=f"down_post_{i}")(h * m[..., None])
                else:
                    h = Conv1d(ch, 3, padding=1, name=f"down_post_{i}")(h * m[..., None])
            else:
                h = Downsample1D(ch, name=f"downsample_{i}")(h * m[..., None])
            masks.append(m[:, :: (1 if is_last else 2)])
        masks = masks[:-1]

        # ---- mid ----
        m = masks[-1]
        bias = _attn_bias(m, streaming, cfg.static_chunk_size)
        for i in range(cfg.num_mid_blocks):
            h = resnet(cfg.channels[-1], f"mid_resnet_{i}")(h, m, t_emb)
            for blk in tblocks(f"mid_tf_{i}"):
                h = blk(h, bias)

        # ---- up path ----
        up_channels = cfg.channels[::-1] + (cfg.channels[0],)
        for i in range(len(up_channels) - 1):
            ch = up_channels[i + 1]
            m = masks.pop()
            bias = _attn_bias(m, streaming, cfg.static_chunk_size)
            skip = hiddens.pop()
            h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
            h = resnet(ch, f"up_resnet_{i}")(h, m, t_emb)
            for blk in tblocks(f"up_tf_{i}"):
                h = blk(h, bias)
            is_last = i == len(up_channels) - 2
            if is_last:
                if cfg.causal:
                    h = CausalConv1d(ch, 3, name=f"up_post_{i}")(h * m[..., None])
                else:
                    h = Conv1d(ch, 3, padding=1, name=f"up_post_{i}")(h * m[..., None])
            else:
                h = Upsample1DTranspose(ch, name=f"upsample_{i}")(h * m[..., None])

        if cfg.causal:
            h = CausalBlock1D(up_channels[-1], name="final_block")(h, m)
        else:
            h = Block1D(up_channels[-1], name="final_block")(h, m)
        out = Conv1d(cfg.out_channels, 1, name="final_proj")(h * m[..., None])
        return out * mask[..., None]
