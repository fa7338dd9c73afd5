"""CosyVoice v1 LM: WeNet-style text conformer + rel-pos transformer LM.

Re-design of cosyvoice/llm/llm.py:34-223 (TransformerLM). Input sequence is
[sos][spk][text-encoder output][task_id][speech...]; the LM body is a 14-block
rel-pos transformer (cosyvoice.yaml:44-57) decoded step-by-step.

TPU decode design: instead of the reference's concatenated per-step KV cache
(attention.py:186-194), a preallocated arena [L, B, max, H, d] is updated in
place; the espnet relative-position term for a single query at global
position `cur` against arena keys j is a length-`max` dynamic slice of
q_v . P_full starting at (max-1-cur) — algebraically identical to rel_shift
(see nn/attention.py) with zero dynamic shapes.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.attention import masked_softmax
from cosyvoice_tpu.nn.conformer import ConformerEncoder, ConformerEncoderLayer, LinearInputLayer
from cosyvoice_tpu.nn.embedding import EspnetRelPositionalEncoding
from cosyvoice_tpu.ops.masks import make_non_pad_mask
from cosyvoice_tpu.ops.sampling import ras_sampling_batch


@dataclass(frozen=True)
class LMv1Config:
    text_encoder_input_size: int = 512
    llm_input_size: int = 1024
    llm_output_size: int = 1024
    text_token_size: int = 51866
    speech_token_size: int = 4096
    spk_embed_dim: int = 192
    # text encoder
    te_heads: int = 16
    te_linear_units: int = 4096
    te_blocks: int = 6
    # llm body
    lm_heads: int = 16
    lm_linear_units: int = 4096
    lm_blocks: int = 14
    max_cache_len: int = 4096
    # sampling
    top_p: float = 0.8
    top_k: int = 25
    win_size: int = 10
    tau_r: float = 0.1
    block_size: int = 28


class RelPosDecoderLayer(nn.Module):
    """One rel-pos transformer layer with arena-cache single-step decode."""

    size: int
    heads: int
    linear_units: int

    def setup(self):
        d_k = self.size // self.heads
        self.norm_mha = nn.LayerNorm(epsilon=1e-12)
        self.norm_ff = nn.LayerNorm(epsilon=1e-12)
        self.linear_q = nn.Dense(self.size)
        self.linear_k = nn.Dense(self.size)
        self.linear_v = nn.Dense(self.size)
        self.linear_out = nn.Dense(self.size)
        self.linear_pos = nn.Dense(self.size, use_bias=False)
        self.pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (self.heads, d_k))
        self.pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (self.heads, d_k))
        self.ff_w1 = nn.Dense(self.linear_units)
        self.ff_w2 = nn.Dense(self.size)

    def _heads(self, x):
        B, T, _ = x.shape
        return x.reshape(B, T, self.heads, self.size // self.heads)

    def full(self, x, att_mask, pos_emb):
        """Teacher-forced / prefill pass over [B, S, D]. Returns (y, k, v)."""
        h = self.norm_mha(x)
        q = self._heads(self.linear_q(h))
        k = self._heads(self.linear_k(h))
        v = self._heads(self.linear_v(h))
        p = self._heads(self.linear_pos(pos_emb))
        d_k = self.size // self.heads
        q_u = q + self.pos_bias_u
        q_v = q + self.pos_bias_v
        ac = jnp.einsum("bthd,bshd->bhts", q_u, k)
        bd = jnp.einsum("bthd,bphd->bhtp", q_v, p[0][None])
        # rel_shift via the espnet zero-pad + reshape trick (pure layout ops;
        # the take_along_axis form lowers to a slow TPU gather):
        # out[i, j] = bd[i, j + T-1-i]
        T = x.shape[1]
        Bh, H = bd.shape[0], self.heads
        bd = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))
        bd = bd.reshape(Bh, H, 2 * T, T)[:, :, 1:, :].reshape(Bh, H, T, 2 * T - 1)[..., :T]
        scores = (ac + bd) / np.sqrt(d_k)
        attn = masked_softmax(scores, att_mask)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(x.shape)
        x = x + self.linear_out(o)
        h = self.norm_ff(x)
        x = x + self.ff_w2(jax.nn.relu(self.ff_w1(h)))
        return x, k, v

    def step(self, x, cur, k_arena, v_arena, pe_full):
        """Single-token decode. x: [B, 1, D]; cur: [B] write position;
        arenas: [B, max, H, d]; pe_full: [2*max-1, D]."""
        B = x.shape[0]
        max_len = k_arena.shape[1]
        d_k = self.size // self.heads
        h = self.norm_mha(x)
        q = self._heads(self.linear_q(h))[:, 0]  # [B, H, d] after squeeze? -> [B, 1, H, d] squeeze
        k_new = self._heads(self.linear_k(h))
        v_new = self._heads(self.linear_v(h))
        k_arena = jax.lax.dynamic_update_slice(k_arena, k_new, (0, cur[0], 0, 0))
        v_arena = jax.lax.dynamic_update_slice(v_arena, v_new, (0, cur[0], 0, 0))

        q_u = q + self.pos_bias_u
        q_v = q + self.pos_bias_v
        ac = jnp.einsum("bhd,bshd->bhs", q_u, k_arena)
        p = self._heads(self.linear_pos(pe_full[None]))[0]  # [2max-1, H, d]
        bd_full = jnp.einsum("bhd,phd->bhp", q_v, p)  # [B, H, 2max-1]
        # slice out relative positions for keys j=0..max-1: index (max-1-cur+j)
        bd = jax.lax.dynamic_slice_in_dim(bd_full, max_len - 1 - cur[0], max_len, axis=-1)
        scores = (ac + bd) / np.sqrt(d_k)
        valid = jnp.arange(max_len)[None, :] <= cur[:, None]
        scores = jnp.where(valid[:, None, :], scores, -1.0e30)
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhs,bshd->bhd", attn, v_arena).reshape(B, 1, self.size)
        x = x + self.linear_out(o)
        h = self.norm_ff(x)
        x = x + self.ff_w2(jax.nn.relu(self.ff_w1(h)))
        return x, k_arena, v_arena


class TransformerLMModule(nn.Module):
    cfg: LMv1Config

    def setup(self):
        c = self.cfg
        self.text_embedding = nn.Embed(c.text_token_size, c.text_encoder_input_size)
        self.text_encoder = ConformerEncoder(
            output_size=c.llm_input_size,
            attention_heads=c.te_heads,
            linear_units=c.te_linear_units,
            num_blocks=c.te_blocks,
            input_layer="linear",
            static_chunk_size=1,  # causal text encoding (llm.py:86)
        )
        self.text_encoder_affine_layer = nn.Dense(c.llm_input_size)
        self.llm_embedding = nn.Embed(2, c.llm_input_size)
        self.speech_embedding = nn.Embed(c.speech_token_size, c.llm_input_size)
        self.spk_embed_affine_layer = nn.Dense(c.llm_input_size)
        self.llm_decoder = nn.Dense(c.speech_token_size + 1)
        # llm body: linear_legacy input (Dense+LN+ReLU) + 14 rel-pos layers
        self.lm_embed = LinearInputLayer(c.llm_output_size)
        self.lm_pos = EspnetRelPositionalEncoding(c.llm_output_size, max_len=c.max_cache_len)
        self.lm_layers = [
            RelPosDecoderLayer(c.llm_output_size, c.lm_heads, c.lm_linear_units, name=f"lm_layers_{i}")
            for i in range(c.lm_blocks)
        ]
        self.lm_after_norm = nn.LayerNorm(epsilon=1e-5)

    # ------------- text encoding -------------
    def encode_text(self, text: jax.Array, text_len: jax.Array):
        emb = self.text_embedding(jnp.clip(text, 0))
        h, mask = self.text_encoder(emb, text_len, streaming=True)
        return self.text_encoder_affine_layer(h), mask

    def embed_speech(self, tokens: jax.Array):
        return self.speech_embedding(jnp.clip(tokens, 0))

    def embed_spk(self, embedding: jax.Array):
        embedding = embedding / (jnp.linalg.norm(embedding, axis=-1, keepdims=True) + 1e-12)
        return self.spk_embed_affine_layer(embedding)

    def special_emb(self, idx: int):
        return self.llm_embedding(jnp.asarray([idx]))

    # ------------- lm body -------------
    def _embed_lm(self, x, true_len):
        x = self.lm_embed(x)
        x = jax.nn.relu(x)  # linear_legacy adds ReLU (subsampling.py:352-357)
        x, pos = self.lm_pos(x)
        return x, pos

    def lm_prefill(self, lm_input, true_len, k_arena, v_arena):
        """lm_input: [B, S, D] tail-padded embeds. Writes arena; returns
        (hidden_last [B, D], k_arena, v_arena)."""
        B, S, _ = lm_input.shape
        x, pos = self._embed_lm(lm_input, true_len)
        qpos = jnp.arange(S)
        causal = qpos[None, :, None] >= qpos[None, None, :]
        valid = qpos[None, None, :] < true_len[:, None, None]
        att_mask = causal & valid
        new_k, new_v = [], []
        for i, layer in enumerate(self.lm_layers):
            x, k, v = layer.full(x, att_mask, pos)
            ka = jax.lax.dynamic_update_slice(k_arena[i], k, (0, 0, 0, 0))
            va = jax.lax.dynamic_update_slice(v_arena[i], v, (0, 0, 0, 0))
            new_k.append(ka)
            new_v.append(va)
        x = self.lm_after_norm(x)
        idx = jnp.clip(true_len - 1, 0)
        hidden_last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        logits = self.llm_decoder(hidden_last).astype(jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    def lm_step(self, token: jax.Array, cur: jax.Array, k_arena, v_arena):
        """token: [B] previous speech token."""
        c = self.cfg
        emb = self.embed_speech(token)[:, None, :]
        x = self.lm_embed(emb)
        x = jax.nn.relu(x) * self.lm_pos.xscale
        pe_full = self.lm_pos.position_encoding(0, self.lm_pos.max_len)[0]  # [2*max-1, D]
        new_k, new_v = [], []
        for i, layer in enumerate(self.lm_layers):
            x, ka, va = layer.step(x, cur, k_arena[i], v_arena[i], pe_full)
            new_k.append(ka)
            new_v.append(va)
        x = self.lm_after_norm(x)
        logits = self.llm_decoder(x[:, 0]).astype(jnp.float32)
        return logits, jnp.stack(new_k), jnp.stack(new_v)

    def prepare(self, text, text_len, spk, prompt_speech, prompt_len, k_arena, v_arena):
        """Fused prompt build + prefill. text: [B, Lt_pad] token ids; spk:
        [B, 192] raw x-vector (pass zeros for the no-speaker instruct mode —
        the reference drops the row entirely, we use the zero projection);
        prompt_speech: [B, Lp_pad] ids. Returns (logits, k, v, total_len)."""
        text_h, _ = self.encode_text(text, text_len)
        spk_emb = self.embed_spk(spk)
        ps_emb = self.embed_speech(prompt_speech)
        embeds, total = self.assemble_prompt(0, spk_emb, text_h, text_len, 1, ps_emb, prompt_len)
        logits, k, v = self.lm_prefill(embeds, total, k_arena, v_arena)
        return logits, k, v, total

    def forward_logits(self, text, text_len, spk, speech, speech_len):
        """Training forward (reference TransformerLM.forward, llm.py:100-148):
        assemble [sos][spk][text][task][speech] embeds and return full-sequence
        logits [B, S, V+1]. Targets align so the task position predicts
        speech[0] and the last speech position predicts EOS (see
        train.trainer.v1_lm_targets)."""
        text_h, _ = self.encode_text(text, text_len)
        spk_emb = self.embed_spk(spk)
        sp_emb = self.embed_speech(speech)
        embeds, total = self.assemble_prompt(0, spk_emb, text_h, text_len, 1, sp_emb, speech_len)
        S = embeds.shape[1]
        x, pos = self._embed_lm(embeds, total)
        qpos = jnp.arange(S)
        causal = qpos[None, :, None] >= qpos[None, None, :]
        valid = qpos[None, None, :] < total[:, None, None]
        att_mask = causal & valid
        for layer in self.lm_layers:
            x, _, _ = layer.full(x, att_mask, pos)
        x = self.lm_after_norm(x)
        return self.llm_decoder(x).astype(jnp.float32), total

    def assemble_prompt(self, sos, spk_emb, text_h, text_len, task, prompt_speech, prompt_len):
        """Build [sos][spk][text][task][speech] embed sequence, tail-padded.

        text_h: [B, Lt, D] encoded text; prompt_speech: [B, Lp, D] embedded
        prompt speech tokens. Returns (embeds [B, S, D], total_len [B])."""
        B, Lt, D = text_h.shape
        Lp = prompt_speech.shape[1]
        S = 2 + Lt + 1 + Lp
        out = jnp.zeros((B, S, D), text_h.dtype)
        out = out.at[:, 0].set(self.special_emb(0)[0])
        out = out.at[:, 1].set(spk_emb)

        def per_sample(o, th, tl, ps, pl):
            o = jax.lax.dynamic_update_slice(o, th, (2, 0))
            o = jax.lax.dynamic_update_slice(o, self.special_emb(1), (2 + tl, 0))
            o = jax.lax.dynamic_update_slice(o, ps, (3 + tl, 0))
            # zero anything past the true end (update slices above wrote
            # padded tails of th/ps)
            total = 3 + tl + pl
            pos = jnp.arange(S)[:, None]
            keep_text = (pos < 2 + tl) | (pos == 2 + tl) | ((pos >= 3 + tl) & (pos < total))
            return jnp.where(keep_text, o, 0.0), total

        out, total = jax.vmap(per_sample)(out, text_h, text_len, prompt_speech, prompt_len)
        return out, total


class TransformerLM:
    """Host orchestrator: prefill + blockwise decode (mirrors Qwen2LM)."""

    def __init__(self, cfg: LMv1Config = LMv1Config()):
        self.cfg = cfg
        self.module = TransformerLMModule(cfg)
        self._jit_prepare = jax.jit(self._prepare_impl)
        self._jit_decode_block = jax.jit(self._decode_block_impl, static_argnames=("block_size",), donate_argnums=(2, 3))

    def init(self, rng: jax.Array) -> dict:
        from cosyvoice_tpu.utils.devices import jit_init

        text = jnp.zeros((1, 8), jnp.int32)
        spk = jnp.zeros((1, self.cfg.spk_embed_dim))
        pst = jnp.zeros((1, 4), jnp.int32)
        k, v = self.init_cache(1)
        return jit_init(self.module.init, rng, text, jnp.asarray([8]), spk, pst,
                        jnp.asarray([4]), k, v, method="prepare")

    def init_cache(self, batch: int):
        c = self.cfg
        d_k = c.llm_output_size // c.lm_heads
        shape = (c.lm_blocks, batch, c.max_cache_len, c.lm_heads, d_k)
        return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)

    def _prepare_impl(self, params, text, text_len, spk, prompt_speech, prompt_len, k_arena, v_arena):
        return self.module.apply(params, text, text_len, spk, prompt_speech, prompt_len, k_arena, v_arena, method="prepare")

    def _decode_block_impl(self, params, rng, k_arena, v_arena, cur_len, first_logits, recent, n_decoded, min_len, finished, block_size: int):
        c = self.cfg
        eos = c.speech_token_size

        def sample(rng_k, logits, n_dec, rec):
            logp = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.where(
                (jnp.arange(eos + 1)[None, :] >= eos) & (n_dec < min_len)[:, None], -1.0e30, logp
            )
            return ras_sampling_batch(
                rng_k, logp, rec, jnp.minimum(n_dec, c.win_size),
                top_p=c.top_p, top_k=c.top_k, win_size=c.win_size, tau_r=c.tau_r,
            )

        def step(carry, _):
            rng_c, ka, va, cur, logits, rec, n_dec, fin = carry
            rng_c, kk = jax.random.split(rng_c)
            tok = sample(kk, logits, n_dec, rec)
            stop_now = tok >= eos
            tok_out = jnp.where(fin, eos, tok)
            fin_next = fin | stop_now
            rec = jnp.where(fin[:, None], rec, jnp.concatenate([rec[:, 1:], tok[:, None]], axis=1))
            n_dec = jnp.where(fin, n_dec, n_dec + 1)
            safe_tok = jnp.where(tok_out >= eos, 0, tok_out)
            logits_next, ka, va = self.module.apply(params, safe_tok, cur, ka, va, method="lm_step")
            cur = cur + jnp.where(fin, 0, 1)
            return (rng_c, ka, va, cur, logits_next, rec, n_dec, fin_next), tok_out

        carry0 = (rng, k_arena, v_arena, cur_len, first_logits, recent, n_decoded, finished)
        carry, tokens = jax.lax.scan(step, carry0, None, length=block_size)
        _, ka, va, cur_len, logits_next, recent, n_decoded, finished = carry
        return tokens.swapaxes(0, 1), logits_next, ka, va, cur_len, recent, n_decoded, finished

    def generate(self, params, text_tokens, spk_embedding, prompt_speech_tokens, rng, min_len, max_len, block_size=None):
        """Yields np.int32 blocks of speech tokens.

        text_tokens: [Lt] (prompt_text + tts_text); spk_embedding: [1, 192]
        raw x-vector (zeros => zero embedding row); prompt_speech_tokens: [Lp].
        """
        c = self.cfg
        block_size = block_size or c.block_size
        bucket = 32
        Lt = len(text_tokens)
        Lp = len(prompt_speech_tokens)
        Lt_pad = max(bucket, int(np.ceil(Lt / bucket)) * bucket)
        Lp_pad = max(4, int(np.ceil(max(Lp, 1) / bucket)) * bucket)
        text = np.zeros((1, Lt_pad), np.int32)
        text[0, :Lt] = text_tokens
        pst = np.zeros((1, Lp_pad), np.int32)
        pst[0, :Lp] = prompt_speech_tokens

        k_arena, v_arena = self.init_cache(1)
        logits, k_arena, v_arena, total_len = self._jit_prepare(
            params, jnp.asarray(text), jnp.asarray([Lt]), jnp.asarray(spk_embedding),
            jnp.asarray(pst), jnp.asarray([Lp]), k_arena, v_arena,
        )
        cur = total_len
        recent = jnp.full((1, c.win_size), -1, jnp.int32)
        n_decoded = jnp.zeros((1,), jnp.int32)
        finished = jnp.zeros((1,), bool)
        min_l = jnp.asarray([min_len], jnp.int32)
        produced = 0
        # one split-chain device call + host-side stop detection: 2 fewer
        # device round trips per block (see llm.py generate)
        from cosyvoice_tpu.models.llm import _split_chain

        n_blocks = max(1, -(-max_len // block_size) + 1)
        _, keys = _split_chain(rng, n_blocks)
        stop_seen = False
        block_i = 0
        while produced < max_len and not stop_seen:
            kk = keys[min(block_i, n_blocks - 1)]
            block_i += 1
            tokens, logits, k_arena, v_arena, cur, recent, n_decoded, finished = self._jit_decode_block(
                params, kk, k_arena, v_arena, cur, logits, recent, n_decoded, min_l, finished, block_size
            )
            toks = np.asarray(tokens[0])
            stop_idx = np.nonzero(toks >= c.speech_token_size)[0]
            if len(stop_idx):
                toks = toks[: stop_idx[0]]
                stop_seen = True
            toks = toks[: max_len - produced]
            produced += len(toks)
            if len(toks):
                yield toks
