"""Speech-token language models (CosyVoice2's Qwen2LM re-designed for TPU).

Reference behavior: cosyvoice/llm/llm.py:257-661. The LM consumes a mixed
sequence of [sos][text tokens][task_id][prompt speech tokens] embeddings and
autoregressively emits speech tokens with RAS sampling; bistream mode
interleaves 5 text / 15 speech tokens with a fill token.

TPU design:
- mixed inputs are (ids, types) pairs embedded by a vectorized 3-way select
  (TEXT -> Qwen embed table, SPEECH -> speech table, SPECIAL -> sos/task)
- prompt prefill is one fused call into a preallocated KV arena
- decoding runs in BLOCKS of `block_size` tokens inside one lax.scan — the
  hot loop (24-layer step + head + log-softmax + RAS sampling) never leaves
  the device; the host only sees one transfer per block
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.qwen2 import Qwen2Config, Qwen2Model
from cosyvoice_tpu.ops.sampling import ras_sampling_batch

# input token source types
TYPE_TEXT = 0
TYPE_SPEECH = 1
TYPE_SPECIAL = 2  # llm_embedding rows: 0 = sos, 1 = task_id

IGNORE_ID = -100


@partial(jax.jit, static_argnames=("n",))
def _split_chain(rng: jax.Array, n: int):
    """The key chain `rng, k = split(rng)` repeated n times, in ONE device
    call: returns (carry, keys[n]) with keys[i] == split(split(...)[0])[1] —
    bit-equal to the per-block split it replaces (decode streams are
    unchanged); `carry` continues the chain."""

    def body(carry, _):
        nxt, k = jax.random.split(carry)
        return nxt, k

    return jax.lax.scan(body, rng, None, length=n)


@dataclass(frozen=True)
class LMConfig:
    speech_token_size: int = 6561
    num_special_head: int = 3  # eos / unused / fill  (v3: 200)
    llm_input_size: int = 896
    mix_ratio: Tuple[int, int] = (5, 15)
    top_p: float = 0.8
    top_k: int = 25
    win_size: int = 10
    tau_r: float = 0.1
    # serving sampling-convention knobs (the reference's Triton consumer
    # decodes with top_p 0.95 / top_k 50 / temperature 0.8 /
    # repetition_penalty 1.1, model_repo/cosyvoice2/1/model.py:116-126).
    # Defaults are identity: the RAS token streams are bit-unchanged.
    temperature: float = 1.0
    repetition_penalty: float = 1.0
    block_size: int = 28  # tokens decoded per device call (= chunk 25 + lookahead 3)
    qwen: Qwen2Config = field(default_factory=Qwen2Config)
    # v3-style token layout: sos/eos/task/fill live inside the speech table
    special_in_speech_table: bool = False

    @property
    def head_size(self) -> int:
        return self.speech_token_size + self.num_special_head

    @property
    def eos_token(self) -> int:
        return self.speech_token_size

    @property
    def fill_token(self) -> int:
        return self.speech_token_size + (3 if self.special_in_speech_table else 2)

    @property
    def sos_id(self) -> int:
        return self.speech_token_size if self.special_in_speech_table else 0

    @property
    def task_id(self) -> int:
        return self.speech_token_size + 2 if self.special_in_speech_table else 1


class Qwen2LMModule(nn.Module):
    cfg: LMConfig

    def setup(self):
        c = self.cfg
        self.llm = Qwen2Model(c.qwen)
        dim = c.qwen.hidden_size
        if not c.special_in_speech_table:
            self.llm_embedding = nn.Embed(2, dim)
        self.speech_embedding = nn.Embed(c.head_size, dim)
        if c.qwen.quant:
            from cosyvoice_tpu.models.qwen2 import QuantDense

            # head stays int8 even in int4 mode: head_size (6564) is not
            # lane-aligned for the int4 tile and the head is ~1% of weights
            self.llm_decoder = QuantDense(
                c.head_size, use_bias=not c.special_in_speech_table, dtype=c.qwen.dtype
            )
        else:
            self.llm_decoder = nn.Dense(c.head_size, use_bias=not c.special_in_speech_table)

    # ---------------- embedding of mixed sequences ----------------
    def embed_input(self, ids: jax.Array, types: jax.Array) -> jax.Array:
        """ids/types: [B, T] -> [B, T, C]."""
        safe = jnp.clip(ids, 0)
        text = self.llm.embed_text(jnp.where(types == TYPE_TEXT, safe, 0))
        speech = self.speech_embedding(jnp.where(types == TYPE_SPEECH, jnp.minimum(safe, self.cfg.head_size - 1), 0))
        if self.cfg.special_in_speech_table:
            special = self.speech_embedding(jnp.where(types == TYPE_SPECIAL, jnp.minimum(safe, self.cfg.head_size - 1), 0))
        else:
            special = self.llm_embedding(jnp.where(types == TYPE_SPECIAL, jnp.minimum(safe, 1), 0))
        out = jnp.where(
            (types == TYPE_TEXT)[..., None], text, jnp.where((types == TYPE_SPEECH)[..., None], speech, special)
        )
        return out

    # ---------------- training ----------------
    def forward_logits(self, ids, types, lengths):
        """Full teacher-forced forward -> logits [B, T, head]."""
        embeds = self.embed_input(ids, types)
        valid = jnp.arange(ids.shape[1])[None, :] < lengths[:, None]
        hidden = self.llm(embeds, valid)
        return self.llm_decoder(hidden).astype(jnp.float32)

    # ---------------- inference ----------------
    def prefill(self, ids, types, true_len, cache):
        embeds = self.embed_input(ids, types)
        hidden_last, cache = self.llm.prefill(embeds, true_len, cache)
        logits = self.llm_decoder(hidden_last).astype(jnp.float32)
        return logits, cache

    def decode_step(self, token: jax.Array, cur_len: jax.Array, cache):
        """token: [B] previous speech token -> (logits [B, head], cache)."""
        emb = self.speech_embedding(jnp.minimum(token, self.cfg.head_size - 1))[:, None, :]
        hidden, cache = self.llm.decode_step(emb, cur_len, cache)
        return self.llm_decoder(hidden).astype(jnp.float32), cache

    def decode_step_ragged(self, token: jax.Array, cur_len: jax.Array, cache):
        """decode_step with per-row positions (continuous batching)."""
        emb = self.speech_embedding(jnp.minimum(token, self.cfg.head_size - 1))[:, None, :]
        hidden, cache = self.llm.decode_step_ragged(emb, cur_len, cache)
        return self.llm_decoder(hidden).astype(jnp.float32), cache

    def decode_step_fused(self, token: jax.Array, cur_len: jax.Array, cache, stacked):
        """Single-stream int4p decode step through the whole-step Pallas
        kernel (ops/int4_block.py): every layer in ONE pallas_call, KV rows
        committed with one dynamic_update_slice across all layers. `stacked`
        is the stacked weight pack from stack_decode_params (built once per
        decode block in Qwen2LM._decode_block_impl)."""
        from cosyvoice_tpu.nn.embedding import rope_frequencies
        from cosyvoice_tpu.ops.int4_block import int4_decode_layers

        c = self.cfg
        q = c.qwen
        emb = self.speech_embedding(jnp.minimum(token, c.head_size - 1))  # [1, C]
        rc, rs = rope_frequencies(q.head_dim, q.max_cache_len, q.rope_theta)
        pos = cur_len[0]
        cos = jax.lax.dynamic_slice_in_dim(rc, pos, 1, axis=0)  # [1, d/2]
        sin = jax.lax.dynamic_slice_in_dim(rs, pos, 1, axis=0)
        L, A = q.num_layers, cache[0].shape[2]
        lanes = q.num_kv_heads * q.head_dim
        ka = cache[0].reshape(L, A, lanes)
        va = cache[1].reshape(L, A, lanes)
        xo, kn, vn = int4_decode_layers(
            emb, cos, sin, pos, ka, va, **stacked,
            eps=q.rms_norm_eps, out_dtype=q.dtype,
            interpret=jax.default_backend() != "tpu",
        )
        kup = kn.reshape(L, 1, 1, q.num_kv_heads, q.head_dim).astype(cache[0].dtype)
        vup = vn.reshape(L, 1, 1, q.num_kv_heads, q.head_dim).astype(cache[1].dtype)
        ck = jax.lax.dynamic_update_slice(cache[0], kup, (0, 0, pos, 0, 0))
        cv = jax.lax.dynamic_update_slice(cache[1], vup, (0, 0, pos, 0, 0))
        hidden = self.llm.final_norm(xo)
        return self.llm_decoder(hidden).astype(jnp.float32), (ck, cv)

    def extend_mixed(self, ids, types, start, cache):
        """Append an exact-shape mixed segment (bistream). Returns (logits
        of the last position, cache)."""
        embeds = self.embed_input(ids, types)
        hidden_last, cache = self.llm.extend(embeds, start, cache)
        return self.llm_decoder(hidden_last).astype(jnp.float32), cache


class Qwen2LM:
    """Functional orchestrator: jitted prefill + blockwise decode."""

    def __init__(self, cfg: LMConfig = LMConfig()):
        self.cfg = cfg
        self.module = Qwen2LMModule(cfg)
        self._jit_prefill = jax.jit(
            lambda p, ids, types, tl, cache: self.module.apply(p, ids, types, tl, cache, method="prefill")
        )
        self._jit_decode_block = jax.jit(
            self._decode_block_impl, static_argnames=("block_size", "bistream", "ragged"), donate_argnums=(2,)
        )
        self._jit_extend = jax.jit(
            lambda p, ids, types, start, cache: self.module.apply(p, ids, types, start, cache, method="extend_mixed"),
            donate_argnums=(4,),
        )

    def init(self, rng: jax.Array) -> dict:
        from cosyvoice_tpu.utils.devices import jit_init

        ids = jnp.zeros((1, 8), jnp.int32)
        types = jnp.zeros((1, 8), jnp.int32)
        return jit_init(self.module.init, rng, ids, types, jnp.asarray([8]), method="forward_logits")

    ARENA_BUCKET = 512  # KV arena lengths are multiples of this (bounds recompiles)

    def init_cache(self, batch: int = 1, length: Optional[int] = None):
        q = self.cfg.qwen
        T = length or q.max_cache_len
        shape = (q.num_layers, batch, T, q.num_kv_heads, q.head_dim)
        if q.kv_quant:
            sshape = (q.num_layers, batch, T)
            return (
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(sshape, jnp.float32),
                jnp.zeros(sshape, jnp.float32),
            )
        return (jnp.zeros(shape, q.dtype), jnp.zeros(shape, q.dtype))

    def arena_bucket(self, need: int) -> int:
        """Smallest legal arena length covering `need` positions: HBM reads in
        the decode attention scale with the arena, so the arena starts small
        and grows in ARENA_BUCKET steps instead of being preallocated at
        max_cache_len (the TPU analog of vLLM's paged KV growth)."""
        b = self.ARENA_BUCKET
        return min(((need + b - 1) // b) * b, self.cfg.qwen.max_cache_len)

    def grow_cache(self, cache, new_len: int):
        """Extend the KV arena (axis 2 of every leaf: [L, B, T, ...] KV
        arrays and [L, B, T] scale planes) with zeros to new_len."""
        pad = new_len - cache[0].shape[2]
        if pad <= 0:
            return cache

        def _pad(a):
            widths = [(0, 0)] * a.ndim
            widths[2] = (0, pad)
            return jnp.pad(a, widths)

        return tuple(_pad(a) for a in cache)

    # ---------------- decode ----------------
    def _decode_pack(self, params, cache):
        """Host-side gate + cache for the whole-step fused int4p weight pack
        (ops/int4_block.py). Built ONCE per params object and reused across
        decode blocks — building it inside the jitted block would re-copy all
        layers' packed weights (~the full LM) on device every block."""
        c = self.cfg
        # kv_quant: the fused whole-step kernel reads a bf16 arena; int8-KV
        # decode goes through decode_step(+flash-quant attention) instead
        if c.qwen.quant != "int4p" or c.qwen.kv_quant or cache[0].shape[1] != 1:
            return None
        import os

        from cosyvoice_tpu.models.qwen2 import _int4p_use_pallas
        from cosyvoice_tpu.ops.int4_block import MAX_FUSED_ARENA, stack_decode_params

        q = c.qwen
        qkv_out = (q.num_heads + 2 * q.num_kv_heads) * q.head_dim
        lanes = q.num_kv_heads * q.head_dim
        mode = os.environ.get("COSY_INT4_BLOCK", "1")
        ok = (
            mode != "0"
            and cache[0].shape[2] <= MAX_FUSED_ARENA
            # the fused kernel's MXU dots need 128-lane-aligned qkv/arena
            # layouts; non-multiple head configs take the per-matmul path
            and qkv_out % 128 == 0
            and lanes % 128 == 0
            and (_int4p_use_pallas(1, q.hidden_size, q.hidden_size) or mode == "force")
        )
        if not ok:
            return None
        cached = getattr(self, "_pack_cache", None)
        if cached is None or cached[0] is not params:
            pack = stack_decode_params(
                [params["params"]["llm"][f"layers_{i}"] for i in range(c.qwen.num_layers)]
            )
            self._pack_cache = (params, pack)
        return self._pack_cache[1]

    def _decode_block_impl(
        self,
        params,
        rng,
        cache,
        cur_len,          # [B] positions already in cache
        first_logits,     # [B, head] logits for the next token (from prefill or carry)
        recent,           # [B, win] ring of last tokens
        n_decoded,        # [B]
        min_len,          # [B]
        finished,         # [B] bool
        block_size: int,
        bistream: bool = False,
        ragged: bool = False,  # per-row positions (continuous batching)
        stacked=None,          # whole-step fused int4p pack (built host-side
                               # once per params in _decode_pack, NOT re-staged
                               # on device every block)
        seen=None,             # [B, head_size] bool presence set for the
                               # repetition penalty (None = penalty disabled;
                               # passing it appends the updated set to the
                               # returns, so default callers are unchanged)
    ):
        """Decode up to block_size tokens fully on device.

        Returns (tokens [B, block], logits_next, cache, cur_len, recent,
        n_decoded, finished[, seen]).
        """
        c = self.cfg
        eos = c.eos_token

        def sample(rng_k, logits, n_dec, rec, seen_c):
            if c.temperature != 1.0:
                logits = logits / c.temperature
            if seen_c is not None and c.repetition_penalty != 1.0:
                from cosyvoice_tpu.ops.sampling import apply_repetition_penalty

                logits = apply_repetition_penalty(logits, seen_c, c.repetition_penalty)
            logp = jax.nn.log_softmax(logits, axis=-1)
            if bistream:
                # bistream inner loop (llm.py:620-641): the fill token is a
                # legal handoff, every other stop id is suppressed.
                bad = (jnp.arange(c.head_size) >= c.speech_token_size) & (
                    jnp.arange(c.head_size) != c.fill_token
                )
                logp = jnp.where(bad[None, :], -1.0e30, logp)
            elif c.special_in_speech_table:
                # v3 layout: the reference's pre-min_len mask (llm.py:157-158)
                # suppresses row `speech_token_size`, which in v3 is the SOS
                # row — i.e. no usable min-len protection for its 200 stop
                # rows. We mask the whole special range instead (TRT-LLM
                # min_tokens semantics), a documented improvement.
                logp = jnp.where(
                    (jnp.arange(c.head_size)[None, :] >= c.speech_token_size) & (n_dec < min_len)[:, None],
                    -1.0e30,
                    logp,
                )
            else:
                # v2: exact reference semantics (llm.py:157-158 ignore_eos) —
                # ONLY eos is suppressed before min_len; the other stop ids
                # stay samplable and terminate generation even pre-min_len
                # (llm.py:544-545 `if top_ids in self.stop_token_ids: break`).
                # Token-stream parity is asserted in tests/test_lm_golden.py.
                logp = jnp.where(
                    (jnp.arange(c.head_size)[None, :] == c.eos_token) & (n_dec < min_len)[:, None],
                    -1.0e30,
                    logp,
                )
            return ras_sampling_batch(
                rng_k, logp, rec, jnp.minimum(n_dec, c.win_size),
                top_p=c.top_p, top_k=c.top_k, win_size=c.win_size, tau_r=c.tau_r,
            )

        def step(carry, _):
            rng_c, cache_c, cur, logits, rec, n_dec, fin, seen_c = carry
            rng_c, k = jax.random.split(rng_c)
            tok = sample(k, logits, n_dec, rec, seen_c)
            stop_now = tok >= c.speech_token_size
            tok_out = jnp.where(fin, eos, tok)
            fin_next = fin | stop_now
            rec = jnp.where(
                fin[:, None], rec, jnp.concatenate([rec[:, 1:], tok[:, None]], axis=1)
            )
            n_dec = jnp.where(fin, n_dec, n_dec + 1)
            if seen_c is not None:
                hit = jnp.arange(c.head_size)[None, :] == tok[:, None]
                seen_c = jnp.where(fin[:, None], seen_c, seen_c | hit)
            if stacked is not None:
                logits_next, cache_c = self.module.apply(
                    params, tok_out, cur, cache_c, stacked, method="decode_step_fused"
                )
            else:
                logits_next, cache_c = self.module.apply(
                    params, tok_out, cur, cache_c,
                    method="decode_step_ragged" if ragged else "decode_step",
                )
            cur = cur + jnp.where(fin, 0, 1)
            return (rng_c, cache_c, cur, logits_next, rec, n_dec, fin_next, seen_c), tok_out

        carry0 = (rng, cache, cur_len, first_logits, recent, n_decoded, finished, seen)
        carry, tokens = jax.lax.scan(step, carry0, None, length=block_size)
        _, cache, cur_len, logits_next, recent, n_decoded, finished, seen = carry
        out = (tokens.swapaxes(0, 1), logits_next, cache, cur_len, recent, n_decoded, finished)
        return out + (seen,) if seen is not None else out

    def generate(
        self,
        params: dict,
        prompt_ids: np.ndarray,
        prompt_types: np.ndarray,
        rng: jax.Array,
        min_len: int,
        max_len: int,
        block_size: Optional[int] = None,
    ):
        """Host generator: yields speech-token blocks (np.ndarray) until stop.

        prompt_ids/types: [T] mixed sequence [sos, text..., task, prompt speech...].
        """
        c = self.cfg
        block_size = block_size or c.block_size
        T = len(prompt_ids)
        # tail-pad prompt to a bucket to bound prefill recompiles (capped so
        # small-cache configs keep room to decode)
        bucket = min(128, max(c.qwen.max_cache_len // 4, 8))
        pad_T = ((T + bucket - 1) // bucket) * bucket
        ids = np.zeros((1, pad_T), np.int32)
        types = np.full((1, pad_T), TYPE_SPEECH, np.int32)
        ids[0, :T] = prompt_ids
        types[0, :T] = prompt_types

        # arena capacity guard: past max_cache_len the KV writes/rope slices
        # would silently clamp to the last slot and garble output — clamp
        # max_len to whole blocks that fit and say so
        capacity = ((c.qwen.max_cache_len - pad_T - 1) // block_size) * block_size
        if max_len > capacity:
            import logging

            logging.warning(
                "max_len %d exceeds KV arena capacity (max_cache_len=%d, prompt pad %d); clamping to %d",
                max_len, c.qwen.max_cache_len, pad_T, capacity,
            )
            max_len = max(capacity, 0)
            min_len = min(min_len, max_len)

        cache = self.init_cache(1, length=self.arena_bucket(pad_T + block_size + 1))
        logits, cache = self._jit_prefill(params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray([T]), cache)

        cur_len = jnp.asarray([T])
        recent = jnp.full((1, c.win_size), -1, jnp.int32)
        n_decoded = jnp.zeros((1,), jnp.int32)
        finished = jnp.zeros((1,), bool)
        min_l = jnp.asarray([min_len], jnp.int32)
        seen = None
        if c.repetition_penalty != 1.0:
            # presence set seeded with the prompt's speech tokens (TRT-LLM
            # penalizes ids seen anywhere in the sequence)
            seen_np = np.zeros((1, c.head_size), bool)
            sp = prompt_ids[np.asarray(prompt_types) == TYPE_SPEECH]
            seen_np[0, sp[sp < c.head_size]] = True
            seen = jnp.asarray(seen_np)

        produced = 0
        cur_host = T  # host mirror of the worst-case write position
        # one split for the whole generation: per-block jax.random.split is a
        # device round trip per block — through a remote-TPU tunnel that is
        # ~an RTT of pure latency per 28 tokens. keys[i] below is an async
        # slice dispatch, never a host sync. Key schedule (split-off-the-left
        # chain) is preserved exactly: split(rng)[1], split(split(rng)[0])[1], ...
        n_blocks = max(1, -(-max_len // block_size) + 1)
        _, keys = _split_chain(rng, n_blocks)
        stop_seen = False
        block_i = 0
        while produced < max_len and not stop_seen:
            cache = self.grow_cache(cache, self.arena_bucket(cur_host + block_size + 1))
            k = keys[min(block_i, n_blocks - 1)]
            block_i += 1
            tokens, logits, cache, cur_len, recent, n_decoded, finished, *seen_out = self._jit_decode_block(
                params, k, cache, cur_len, logits, recent, n_decoded, min_l, finished, block_size,
                stacked=self._decode_pack(params, cache), seen=seen,
            )
            if seen_out:
                seen = seen_out[0]
            cur_host += block_size
            # the ONLY host sync per block: fetch the tokens; stop is derived
            # on host (saves the bool(finished) round trip)
            toks = np.asarray(tokens[0])
            stop_idx = np.nonzero(toks >= c.speech_token_size)[0]
            if len(stop_idx):
                toks = toks[: stop_idx[0]]
                stop_seen = True
            toks = toks[: max_len - produced]
            produced += len(toks)
            if len(toks):
                yield toks

    def generate_continue(
        self,
        params: dict,
        state: tuple,     # (cache, cur_len, logits, recent, n_decoded, finished) device state
        min_l,            # [1] int32 device array (same one generate built)
        max_len: int,
        keys,             # [n_blocks, 2] key schedule from _split_chain
        key_start: int,   # blocks already consumed by the fused first-chunk program
        produced0: int,   # tokens already yielded by those blocks
        cur_host0: int,   # host mirror of the arena write position
        block_size: Optional[int] = None,
    ):
        """Continue `generate`'s block loop from mid-stream device state.

        The engine's fused first-chunk program (runtime/engine.py) runs
        prefill + the first block(s) inside one device program; this picks up
        the identical key schedule at keys[key_start], so the token stream is
        bit-equal to an uninterrupted generate()."""
        c = self.cfg
        block_size = block_size or c.block_size
        cache, cur_len, logits, recent, n_decoded, finished = state
        produced, cur_host = produced0, cur_host0
        n_blocks = keys.shape[0]
        stop_seen = False
        block_i = key_start
        while produced < max_len and not stop_seen:
            cache = self.grow_cache(cache, self.arena_bucket(cur_host + block_size + 1))
            k = keys[min(block_i, n_blocks - 1)]
            block_i += 1
            tokens, logits, cache, cur_len, recent, n_decoded, finished = self._jit_decode_block(
                params, k, cache, cur_len, logits, recent, n_decoded, min_l, finished, block_size,
                stacked=self._decode_pack(params, cache),
            )
            cur_host += block_size
            toks = np.asarray(tokens[0])
            stop_idx = np.nonzero(toks >= c.speech_token_size)[0]
            if len(stop_idx):
                toks = toks[: stop_idx[0]]
                stop_seen = True
            toks = toks[: max_len - produced]
            produced += len(toks)
            if len(toks):
                yield toks

    # ---------------- bistream (streaming text input) ----------------
    def generate_bistream(
        self,
        params: dict,
        text_stream,              # iterator of np.int32 arrays (text token chunks)
        prompt_text: np.ndarray,  # [Lpt]
        prompt_speech: np.ndarray,  # [Lps]
        rng: jax.Array,
        max_len: int = 4096,
    ):
        """Bi-streaming decode (reference llm.py:551-661): text arrives in
        chunks; 5-text/15-speech blocks interleave with fill-token handoffs;
        after text exhausts, [remaining text][task] is fed and decoding runs
        to eos. Yields np.int32 speech-token arrays.

        TPU design: exact-shape `extend` calls append segments into the KV
        arena; speech decoding runs in on-device blocks sized to the next
        fill-cadence point. Sampled (or cadence-forced) fill tokens are
        recorded but never fed — the next text segment overwrites their arena
        slot, matching the reference's `lm_input = lm_input_text` handoff.
        """
        c = self.cfg
        mt, ms = c.mix_ratio

        cache = self.init_cache(1, length=self.ARENA_BUCKET)
        cur = jnp.asarray([0])
        cur_host = 0           # host mirror of the arena write position
        logits = None
        recent = jnp.full((1, c.win_size), -1, jnp.int32)
        n_decoded = jnp.zeros((1,), jnp.int32)
        seen_state = [None]
        if c.repetition_penalty != 1.0:
            seen_np = np.zeros((1, c.head_size), bool)
            sp = np.asarray(prompt_speech, np.int32)
            seen_np[0, sp[sp < c.head_size]] = True
            seen_state[0] = jnp.asarray(seen_np)
        out_count = 0          # decoded tokens including fills (ref out_tokens)
        produced = 0           # yielded speech tokens
        # forced-fill cadence: out index at which a fill must be emitted
        next_fill = (len(prompt_speech) // ms + 1) * ms - len(prompt_speech)
        need_text = True       # a fill (or start) demands a text segment next

        def feed(ids, types):
            nonlocal cache, cur, cur_host, logits
            ids_a = np.asarray(ids, np.int32)[None]
            types_a = np.asarray(types, np.int32)[None]
            cache = self.grow_cache(cache, self.arena_bucket(cur_host + ids_a.shape[1] + 1))
            logits, cache = self._jit_extend(params, jnp.asarray(ids_a), jnp.asarray(types_a), cur, cache)
            cur = cur + ids_a.shape[1]
            cur_host += ids_a.shape[1]

        feed([c.sos_id], [TYPE_SPECIAL])
        text_cache = list(np.asarray(prompt_text, np.int32))
        speech_q = list(np.asarray(prompt_speech, np.int32))

        def decode_span():
            """Decode until the next fill (sampled or forced). Yields arrays;
            returns with the fill recorded in out_count."""
            nonlocal cache, cur, cur_host, logits, recent, n_decoded, out_count, produced, next_fill
            while True:
                steps = max(1, next_fill - out_count)
                rng_k = jax.random.fold_in(rng, 7919 + out_count)
                fin0 = jnp.zeros((1,), bool)
                cache = self.grow_cache(cache, self.arena_bucket(cur_host + steps + 1))
                tokens, logits, cache, cur, recent, n_decoded, fin, *seen_out = self._jit_decode_block(
                    params, rng_k, cache, cur, logits, recent, n_decoded,
                    jnp.asarray([0], jnp.int32), fin0, steps, True,
                    stacked=self._decode_pack(params, cache), seen=seen_state[0],
                )
                if seen_out:
                    seen_state[0] = seen_out[0]
                cur_host += steps
                toks = np.asarray(tokens[0])
                stop = np.nonzero(toks >= c.speech_token_size)[0]
                if len(stop):
                    emit = toks[: stop[0]]
                    # roll the arena position back over the sampled fill: the
                    # reference never feeds it (llm.py:635-641 breaks before
                    # the lm_input update), so the next text segment must land
                    # right after the last REAL token. In-block, the fill step
                    # advanced the device cur by exactly 1 and then froze
                    # (fin), so device rollback is 1; the host worst-case
                    # mirror advanced by `steps`. Entries at/beyond cur are
                    # masked out and overwritten by the next extend.
                    cur = cur - 1
                    cur_host -= steps - int(stop[0])
                    out_count += len(emit)
                    produced += len(emit)
                    if len(emit):
                        yield emit
                    next_fill = out_count + ms + 1  # llm.py:632
                    out_count += 1  # the sampled fill
                    return
                out_count += len(toks)
                produced += len(toks)
                if len(toks):
                    yield toks
                if out_count >= next_fill:
                    # cadence-forced fill (llm.py:626-628)
                    next_fill = out_count + ms + 1
                    out_count += 1
                    return

        for this_text in text_stream:
            text_cache.extend(np.asarray(this_text, np.int32).tolist())
            # interleave remaining prompt speech (llm.py:596-604)
            while len(speech_q) > 0 and len(text_cache) >= mt:
                feed(text_cache[:mt], [TYPE_TEXT] * mt)
                n_sp = min(ms, len(speech_q))
                feed(speech_q[:n_sp], [TYPE_SPEECH] * n_sp)
                text_cache, speech_q = text_cache[mt:], speech_q[n_sp:]
                need_text = True
            if len(speech_q) > 0:
                continue
            while len(text_cache) >= mt:
                if need_text:
                    feed(text_cache[:mt], [TYPE_TEXT] * mt)
                    text_cache = text_cache[mt:]
                    need_text = False
                yield from decode_span()
                need_text = True
                if produced >= max_len:
                    return

        # ---- final drain: [remaining text][task], decode to eos ----
        feed(text_cache + [c.task_id], [TYPE_TEXT] * len(text_cache) + [TYPE_SPECIAL])
        finished = jnp.zeros((1,), bool)
        while produced < max_len and not bool(finished[0]):
            rng, k = jax.random.split(rng)
            cache = self.grow_cache(cache, self.arena_bucket(cur_host + self.cfg.block_size + 1))
            tokens, logits, cache, cur, recent, n_decoded, finished, *seen_out = self._jit_decode_block(
                params, k, cache, cur, logits, recent, n_decoded,
                jnp.asarray([0], jnp.int32), finished, self.cfg.block_size, False,
                stacked=self._decode_pack(params, cache), seen=seen_state[0],
            )
            if seen_out:
                seen_state[0] = seen_out[0]
            cur_host += self.cfg.block_size
            toks = np.asarray(tokens[0])
            stop_idx = np.nonzero(toks >= c.speech_token_size)[0]
            if len(stop_idx):
                toks = toks[: stop_idx[0]]
            toks = toks[: max_len - produced]
            produced += len(toks)
            if len(toks):
                yield toks
