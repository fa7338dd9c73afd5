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


def _chunk_attn_bias(B: int, n: int, A: int, pos, real_n, chunk: int) -> jax.Array:
    """Additive bias [B, n, A] for incremental chunk queries at global
    positions pos+i over an arena with pos+real_n valid keys: the streaming
    chunk rule (key s visible iff s < (t//chunk+1)*chunk) intersected with
    the valid frontier. Chunk boundaries are hop-aligned in the engine, so
    the frontier never truncates a chunk except at finalize — exactly the
    full-recompute mask restricted to the new rows."""
    i = jnp.arange(n)[None, :, None]
    s = jnp.arange(A)[None, None, :]
    gl = pos + i
    keep = s < jnp.minimum(pos + real_n, (gl // chunk + 1) * chunk)
    return mask_to_bias(jnp.broadcast_to(keep, (B, n, A)))


def estimator_stream_state(cfg: "EstimatorConfig", B2: int, arena: int):
    """Zero incremental-chunk state for ONE Euler step of ConditionalDecoder:
    per-attention KV arenas [B2, arena, inner] + 2-frame causal-conv caches.
    The CFM solver stacks n_timesteps copies (leading axis) and scans over
    them. B2 = 2*B (the CFG cond/uncond batch doubling)."""
    assert cfg.causal and len(cfg.channels) == 1, "chunked estimator: shipped causal config only"
    inner = cfg.num_heads * cfg.attention_head_dim
    kv_dtype = cfg.dtype or jnp.float32
    ch = cfg.channels[0]
    st = {}

    def tf(name):
        for j in range(cfg.n_blocks):
            st[f"{name}_{j}"] = (
                jnp.zeros((B2, arena, inner), kv_dtype),
                jnp.zeros((B2, arena, inner), kv_dtype),
            )

    st["down_resnet_0"] = (jnp.zeros((B2, 2, cfg.in_channels)), jnp.zeros((B2, 2, ch)))
    tf("down_tf_0")
    st["down_post_0"] = jnp.zeros((B2, 2, ch))
    for i in range(cfg.num_mid_blocks):
        st[f"mid_resnet_{i}"] = (jnp.zeros((B2, 2, ch)), jnp.zeros((B2, 2, ch)))
        tf(f"mid_tf_{i}")
    st["up_resnet_0"] = (jnp.zeros((B2, 2, 2 * ch)), jnp.zeros((B2, 2, ch)))
    tf("up_tf_0")
    st["up_post_0"] = jnp.zeros((B2, 2, ch))
    st["final_block"] = jnp.zeros((B2, 2, ch))
    return st


class ConditionalDecoder(nn.Module):
    cfg: EstimatorConfig = EstimatorConfig()

    @nn.compact
    def __call__(self, x, mask, mu, t, spks, cond, streaming: bool = False, stream=None):
        """x/mu/cond: [B, T, 80]; mask: [B, T] float; t: [B]; spks: [B, 80].

        Returns the estimated vector field [B, T, 80].

        stream=(state, pos, real_n): incremental-chunk mode — x/mu/cond are
        ONLY the new chunk (T = padded chunk length, real_n true frames),
        `state` is the estimator_stream_state dict for this Euler step, `pos`
        the mel frames already in the arenas. Returns (field, new_state).
        Equal to the full-prefix recompute under chunk-causal masks: every
        cached K/V row and conv cache depends only on its own (unchanged)
        prefix inputs.
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

        if stream is not None:
            st, pos, real_n = stream
            st = dict(st)
            from cosyvoice_tpu.nn.conv import roll_cache

            B, n, _ = x.shape
            A = st["down_tf_0_0"][0].shape[1]
            ch = cfg.channels[0]
            m = jnp.broadcast_to((jnp.arange(n)[None, :] < real_n), (B, n)).astype(h.dtype)
            bias = _chunk_attn_bias(B, n, A, pos, real_n, cfg.static_chunk_size)

            def causal3(name, hin):
                hm = hin * m[..., None]
                y = CausalConv1d(ch, 3, name=name)(hm, cache=st[name])
                st[name] = roll_cache(st[name], hm, real_n)
                return y

            h, st["down_resnet_0"] = resnet(ch, "down_resnet_0")(h, m, t_emb, st["down_resnet_0"], real_n)
            for j, blk in enumerate(tblocks("down_tf_0")):
                h, st[f"down_tf_0_{j}"] = blk(h, bias, st[f"down_tf_0_{j}"], pos)
            skip = h
            h = causal3("down_post_0", h)

            for i in range(cfg.num_mid_blocks):
                h, st[f"mid_resnet_{i}"] = resnet(ch, f"mid_resnet_{i}")(h, m, t_emb, st[f"mid_resnet_{i}"], real_n)
                for j, blk in enumerate(tblocks(f"mid_tf_{i}")):
                    h, st[f"mid_tf_{i}_{j}"] = blk(h, bias, st[f"mid_tf_{i}_{j}"], pos)

            h = jnp.concatenate([h, skip], axis=-1)
            h, st["up_resnet_0"] = resnet(ch, "up_resnet_0")(h, m, t_emb, st["up_resnet_0"], real_n)
            for j, blk in enumerate(tblocks("up_tf_0")):
                h, st[f"up_tf_0_{j}"] = blk(h, bias, st[f"up_tf_0_{j}"], pos)
            h = causal3("up_post_0", h)

            h, st["final_block"] = CausalBlock1D(ch, name="final_block")(h, m, st["final_block"], real_n)
            out = Conv1d(cfg.out_channels, 1, name="final_proj")(h * m[..., None])
            return out * m[..., None], st

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
