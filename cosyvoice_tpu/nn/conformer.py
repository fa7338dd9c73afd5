"""Conformer / transformer encoder stack (WeNet lineage, JAX re-design).

Covers the reference's encoder family used by the shipped TTS configs:
- ConformerEncoder with 'linear'/'embed' input layers + espnet rel-pos
  attention (cosyvoice/transformer/encoder.py:338-387)
- UpsampleConformerEncoder: pre-lookahead + 6 blocks + 2x nearest-upsample
  conv + 4 blocks, with static-chunk streaming masks
  (cosyvoice/transformer/upsample_encoder.py:106-321)

All modules are channel-last [B, T, C]; streaming is expressed as full-prefix
recompute with chunk masks (the reference's inference strategy for flow), so
no KV caches are needed here and every call is a fixed-shape XLA program.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosyvoice_tpu.nn.attention import MultiHeadAttention, RelPositionMultiHeadAttention
from cosyvoice_tpu.nn.conv import Conv1d, ConvolutionModule
from cosyvoice_tpu.nn.embedding import EspnetRelPositionalEncoding
from cosyvoice_tpu.ops.masks import add_optional_chunk_mask, make_non_pad_mask


class PositionwiseFeedForward(nn.Module):
    hidden_units: int
    dropout_rate: float = 0.0
    activation: str = "relu"
    dtype: object = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = x.shape[-1]
        x = nn.Dense(self.hidden_units, dtype=self.dtype, name="w_1")(x)
        if self.activation == "swish":
            x = x * jax.nn.sigmoid(x)
        elif self.activation == "relu":
            x = jax.nn.relu(x)
        elif self.activation == "gelu":
            x = jax.nn.gelu(x, approximate=False)
        else:
            raise ValueError(self.activation)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return nn.Dense(d, dtype=self.dtype, name="w_2")(x)


class ConformerEncoderLayer(nn.Module):
    """Pre-norm conformer block; macaron FFN and conv module optional
    (reference: transformer/encoder_layer.py:109-260)."""

    size: int
    attention_heads: int
    linear_units: int
    dropout_rate: float = 0.1
    attention_dropout_rate: float = 0.0
    macaron_style: bool = False
    use_cnn_module: bool = False
    cnn_module_kernel: int = 15
    causal_cnn: bool = False
    key_bias: bool = True
    selfattention_layer_type: str = "rel_selfattn"
    activation: str = "swish"
    dtype: object = None

    @nn.compact
    def __call__(self, x, att_mask=None, pos_emb=None, pad_mask=None, deterministic=True, arena=None, pos=None):
        """arena=(k_arena, v_arena), pos: incremental-chunk mode — x is the
        new chunk, att_mask a bool [B, n, A] arena mask; returns
        (y, new_arena). Full mode returns y."""
        drop = nn.Dropout(self.dropout_rate)
        if self.macaron_style:
            assert arena is None, "chunk mode: macaron not used by flow configs"
            residual = x
            xn = nn.LayerNorm(epsilon=1e-12, name="norm_ff_macaron")(x)
            x = residual + 0.5 * drop(
                PositionwiseFeedForward(self.linear_units, self.dropout_rate, self.activation, self.dtype, name="feed_forward_macaron")(
                    xn, deterministic
                ),
                deterministic=deterministic,
            )
        ff_scale = 0.5 if self.macaron_style else 1.0

        residual = x
        xn = nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x)
        attn_cls = (
            RelPositionMultiHeadAttention if self.selfattention_layer_type == "rel_selfattn" else MultiHeadAttention
        )
        attn = attn_cls(self.attention_heads, self.size, key_bias=self.key_bias, dtype=self.dtype, name="self_attn")
        new_arena = None
        if arena is not None:
            assert not self.use_cnn_module, "chunk mode: cnn module not used by flow configs"
            if self.selfattention_layer_type == "rel_selfattn":
                x_att, k_a, v_a = attn.attend_chunk(xn, xn, xn, arena[0], arena[1], pos, att_mask, pos_emb)
            else:
                x_att, k_a, v_a = attn.attend_chunk(xn, xn, xn, arena[0], arena[1], pos, att_mask)
            new_arena = (k_a, v_a)
        else:
            x_att, _ = attn(xn, xn, xn, mask=att_mask, pos_emb=pos_emb)
        x = residual + drop(x_att, deterministic=deterministic)

        if self.use_cnn_module:
            residual = x
            xn = nn.LayerNorm(epsilon=1e-12, name="norm_conv")(x)
            xc, _ = ConvolutionModule(
                self.size, self.cnn_module_kernel, causal=self.causal_cnn, name="conv_module"
            )(xn, pad_mask)
            x = residual + drop(xc, deterministic=deterministic)

        residual = x
        xn = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        x = residual + ff_scale * drop(
            PositionwiseFeedForward(self.linear_units, self.dropout_rate, self.activation, self.dtype, name="feed_forward")(
                xn, deterministic
            ),
            deterministic=deterministic,
        )
        if self.use_cnn_module:
            x = nn.LayerNorm(epsilon=1e-12, name="norm_final")(x)
        return x if arena is None else (x, new_arena)


class LinearInputLayer(nn.Module):
    """'linear' input layer: Dense + LayerNorm + dropout (subsampling.py:56-88)."""

    output_size: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.output_size, name="out_dense")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="out_norm")(x)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class ConformerEncoder(nn.Module):
    """Generic (conformer or transformer) encoder over full sequences."""

    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    dropout_rate: float = 0.1
    input_layer: str = "linear"
    static_chunk_size: int = 0
    macaron_style: bool = False
    use_cnn_module: bool = False
    key_bias: bool = True
    selfattention_layer_type: str = "rel_selfattn"
    activation: str = "swish"
    vocab_size: int = 0  # for input_layer == 'embed'

    def setup(self):
        if self.input_layer == "linear":
            self.embed = LinearInputLayer(self.output_size, self.dropout_rate)
        elif self.input_layer == "embed":
            self.embed_tokens = nn.Embed(self.vocab_size, self.output_size)
        else:
            raise ValueError(self.input_layer)
        self.pos_enc = EspnetRelPositionalEncoding(self.output_size)
        self.encoders = [
            ConformerEncoderLayer(
                self.output_size,
                self.attention_heads,
                self.linear_units,
                self.dropout_rate,
                macaron_style=self.macaron_style,
                use_cnn_module=self.use_cnn_module,
                key_bias=self.key_bias,
                selfattention_layer_type=self.selfattention_layer_type,
                activation=self.activation,
                name=f"encoders_{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.after_norm = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, xs, xs_lens, streaming=False, deterministic=True):
        T = xs.shape[1]
        pad_mask = make_non_pad_mask(xs_lens, T)  # [B, T]
        if self.input_layer == "embed":
            xs = self.embed_tokens(xs)
        else:
            xs = self.embed(xs, deterministic)
        xs, pos_emb = self.pos_enc(xs)
        att_mask = add_optional_chunk_mask(pad_mask[:, None, :], self.static_chunk_size if streaming else 0)
        for layer in self.encoders:
            xs = layer(xs, att_mask, pos_emb, pad_mask, deterministic)
        return self.after_norm(xs), pad_mask


class PreLookaheadLayer(nn.Module):
    """3-token lookahead conv + causal conv + residual
    (reference: transformer/upsample_encoder.py:66-103)."""

    channels: int
    pre_lookahead_len: int = 3

    @nn.compact
    def __call__(self, x, context=None, cache=None, real_n=None):
        """x: [B, T, C]; context: [B, pre_lookahead_len, C] future tokens or None.

        cache/real_n: incremental-chunk mode — x is the new chunk (already
        embedded+scaled, tail beyond real_n zero), context goes at index
        real_n; `cache` [B, 2, C_mid] holds the previous chunk's last two
        conv1 outputs (conv2's left context). Returns (y, new_cache). The
        lookahead context tokens equal the NEXT chunk's first real tokens,
        so chunk outputs match the full recompute exactly."""
        in_ch = x.shape[-1]
        la = self.pre_lookahead_len
        if cache is not None:
            from cosyvoice_tpu.nn.conv import roll_cache

            buf = jnp.concatenate([x, jnp.zeros((x.shape[0], la, in_ch), x.dtype)], axis=1)
            if context is not None:
                buf = jax.lax.dynamic_update_slice(buf, context.astype(buf.dtype), (0, real_n, 0))
            h = Conv1d(self.channels, la + 1, name="conv1")(buf)  # VALID -> [B, T, mid]
            h = jax.nn.leaky_relu(h, negative_slope=0.01)
            h2 = jnp.concatenate([cache, h], axis=1)
            new_cache = roll_cache(cache, h, real_n)
            y = Conv1d(in_ch, 3, name="conv2")(h2)
            return y + x, new_cache
        if context is None:
            h = jnp.pad(x, ((0, 0), (0, la), (0, 0)))
        else:
            assert context.shape[1] == la
            h = jnp.concatenate([x, context], axis=1)
        h = Conv1d(self.channels, la + 1, name="conv1")(h)
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        h = jnp.pad(h, ((0, 0), (2, 0), (0, 0)))
        h = Conv1d(in_ch, 3, name="conv2")(h)
        return h + x


class Upsample1DConv(nn.Module):
    """2x nearest upsample + left-padded conv (upsample_encoder.py:37-63)."""

    channels: int
    stride: int = 2

    @nn.compact
    def __call__(self, x, cache=None, real_n=None):
        """cache/real_n: incremental-chunk mode — cache [B, stride*2, C]
        holds the previous chunk's last repeated inputs; real_n counts REAL
        (pre-upsample) frames in x. Returns (y, new_cache)."""
        x = jnp.repeat(x, self.stride, axis=1)
        if cache is not None:
            from cosyvoice_tpu.nn.conv import roll_cache

            buf = jnp.concatenate([cache, x], axis=1)
            new_cache = roll_cache(cache, x, real_n * self.stride)
            return Conv1d(self.channels, self.stride * 2 + 1, name="conv")(buf), new_cache
        x = jnp.pad(x, ((0, 0), (self.stride * 2, 0), (0, 0)))
        return Conv1d(self.channels, self.stride * 2 + 1, name="conv")(x)


def chunk_arena_mask(B: int, n: int, A: int, pos, real_n, chunk: int) -> jax.Array:
    """Bool attention mask [B, n, A] for incremental chunk queries at global
    positions pos+i over an arena with pos+real_n valid keys, under the
    streaming chunk rule (key s visible iff s < (t//chunk+1)*chunk)."""
    i = jnp.arange(n)[None, :, None]
    s = jnp.arange(A)[None, None, :]
    keep = s < jnp.minimum(pos + real_n, ((pos + i) // chunk + 1) * chunk)
    return jnp.broadcast_to(keep, (B, n, A))


def upsample_encoder_stream_state(enc: "UpsampleConformerEncoder", B: int, arena_tok: int, arena_mel: int):
    """Zero incremental-chunk state for UpsampleConformerEncoder: KV arenas
    for the 6 token-rate and 4 mel-rate conformer layers + the lookahead
    conv2 / upsample conv caches."""
    kv_dtype = enc.dtype or jnp.float32
    C = enc.output_size
    st = {
        "pre_conv2": jnp.zeros((B, 2, C)),
        "up_conv": jnp.zeros((B, enc.up_stride * 2, C)),
    }
    for i in range(enc.num_blocks):
        st[f"enc_{i}"] = (jnp.zeros((B, arena_tok, C), kv_dtype), jnp.zeros((B, arena_tok, C), kv_dtype))
    for i in range(enc.num_up_blocks):
        st[f"up_enc_{i}"] = (jnp.zeros((B, arena_mel, C), kv_dtype), jnp.zeros((B, arena_mel, C), kv_dtype))
    return st


class UpsampleConformerEncoder(nn.Module):
    """Flow-v2 encoder: lookahead + 6 conformer blocks + 2x upsample + 4 blocks."""

    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    dropout_rate: float = 0.1
    static_chunk_size: int = 25
    pre_lookahead_len: int = 3
    up_stride: int = 2
    dtype: object = None

    def setup(self):
        self.embed = LinearInputLayer(self.output_size, self.dropout_rate)
        self.pos_enc = EspnetRelPositionalEncoding(self.output_size)
        self.pre_lookahead_layer = PreLookaheadLayer(self.output_size, self.pre_lookahead_len)
        self.encoders = [
            ConformerEncoderLayer(
                self.output_size, self.attention_heads, self.linear_units, self.dropout_rate,
                dtype=self.dtype, name=f"encoders_{i}"
            )
            for i in range(self.num_blocks)
        ]
        self.up_layer = Upsample1DConv(self.output_size, self.up_stride)
        self.up_embed = LinearInputLayer(self.output_size, self.dropout_rate)
        self.up_pos_enc = EspnetRelPositionalEncoding(self.output_size)
        self.up_encoders = [
            ConformerEncoderLayer(
                self.output_size, self.attention_heads, self.linear_units, self.dropout_rate,
                dtype=self.dtype, name=f"up_encoders_{i}"
            )
            for i in range(self.num_up_blocks)
        ]
        self.after_norm = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, xs, xs_lens, context=None, streaming=False, deterministic=True):
        """xs: [B, T, C] raw token embeddings, tail-padded with ZEROS beyond
        xs_lens; context: [B, pre_lookahead_len, C] raw embeddings of the
        lookahead tokens or None (finalize). The context is scattered into the
        padded buffer at position xs_lens so the pre-lookahead conv sees it at
        the true boundary (requires T >= xs_lens + pre_lookahead_len).

        Returns ([B, 2T, C], up-sampled pad mask [B, 2T]).
        """
        T = xs.shape[1]
        pad_mask = make_non_pad_mask(xs_lens, T)
        valid_len = xs_lens
        if context is not None:
            # assumes uniform lengths across the (typically size-1) batch
            xs = jax.lax.dynamic_update_slice(xs, context.astype(xs.dtype), (0, xs_lens[0], 0))
            valid_len = xs_lens + context.shape[1]
        xs = self.embed(xs, deterministic)
        xs, pos_emb = self.pos_enc(xs)
        # zero post-embed features beyond the valid(+context) region so the
        # lookahead conv sees the reference's zero padding at the boundary
        xs = xs * make_non_pad_mask(valid_len, T)[..., None]
        att_mask = add_optional_chunk_mask(pad_mask[:, None, :], self.static_chunk_size if streaming else 0)
        xs = self.pre_lookahead_layer(xs, context=None)
        for layer in self.encoders:
            xs = layer(xs, att_mask, pos_emb, pad_mask, deterministic)

        xs = self.up_layer(xs)
        up_lens = xs_lens * self.up_stride
        T2 = xs.shape[1]
        pad_mask2 = make_non_pad_mask(up_lens, T2)
        xs = self.up_embed(xs, deterministic)
        xs, pos_emb2 = self.up_pos_enc(xs)
        att_mask2 = add_optional_chunk_mask(
            pad_mask2[:, None, :], self.static_chunk_size * self.up_stride if streaming else 0
        )
        for layer in self.up_encoders:
            xs = layer(xs, att_mask2, pos_emb2, pad_mask2, deterministic)
        return self.after_norm(xs), pad_mask2

    def forward_chunk(self, xs, context, st, pos, real_n):
        """Incremental streaming chunk (the SURVEY §5.7 TPU re-design: carried
        KV arenas instead of the reference's O(T^2) full-prefix recompute,
        cli/model.py:294-303).

        xs: [B, n, C] RAW token embeddings of the new chunk (zero tail beyond
        real_n); context: [B, pre_lookahead_len, C] raw embeddings of the
        lookahead tokens, or None (finalize). st: upsample_encoder_stream_state
        dict; pos: tokens already consumed. Chunk boundaries must be
        hop-aligned (multiples of static_chunk_size), which the engine's
        prompt pad guarantees. Returns (h [B, n*up_stride, C], new_st) —
        bit-equal to __call__'s rows [pos, pos+real_n) because every cached
        row depends only on its own chunk-causal prefix.
        """
        st = dict(st)
        B, n, _ = xs.shape
        A_tok = st["enc_0"][0].shape[1]
        A_mel = st["up_enc_0"][0].shape[1]
        xs = self.embed(xs, True)
        xs = xs * self.pos_enc.xscale
        valid = jnp.arange(n)[None, :] < real_n
        xs = xs * valid[..., None]
        ctx_emb = None
        if context is not None:
            ctx_emb = self.embed(context, True) * self.pos_enc.xscale
        xs, st["pre_conv2"] = self.pre_lookahead_layer(xs, ctx_emb, st["pre_conv2"], real_n)
        pe_tok = self.pos_enc.position_encoding(0, A_tok)
        mask_tok = chunk_arena_mask(B, n, A_tok, pos, real_n, self.static_chunk_size)
        for i, layer in enumerate(self.encoders):
            xs, st[f"enc_{i}"] = layer(xs, mask_tok, pe_tok, None, True, arena=st[f"enc_{i}"], pos=pos)
        xs, st["up_conv"] = self.up_layer(xs, st["up_conv"], real_n)
        xs = self.up_embed(xs, True)
        xs = xs * self.up_pos_enc.xscale
        pe_mel = self.up_pos_enc.position_encoding(0, A_mel)
        pos2 = pos * self.up_stride
        mask_mel = chunk_arena_mask(
            B, n * self.up_stride, A_mel, pos2, real_n * self.up_stride,
            self.static_chunk_size * self.up_stride,
        )
        for i, layer in enumerate(self.up_encoders):
            xs, st[f"up_enc_{i}"] = layer(xs, mask_mel, pe_mel, None, True, arena=st[f"up_enc_{i}"], pos=pos2)
        return self.after_norm(xs), st
