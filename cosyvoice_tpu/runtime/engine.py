"""Streaming TTS engine: LM token blocks -> chunked flow -> HiFT chunks.

TPU re-design of the reference engine (cosyvoice/cli/model.py:245-394,
CosyVoice2Model):

- same chunk semantics: token_hop_len=25 (== flow static_chunk_size), hop
  doubling to 100, 3-token pre-lookahead gate, prompt padded to a hop
  multiple, flow re-run on the full prefix with the new mel sliced off at
  token_offset*2, HiFT mel/source caches + hamming cross-fade.
- instead of a producer thread + 0.1 s polls, the LM decodes in device-side
  BLOCKS sized to exactly what the next chunk needs, so the pipeline is a
  deterministic interleave with one host sync per block.
- every device call is shape-bucketed: token prefixes pad to multiples of
  `token_bucket`, vocoder mel pads (with log-silence) to `mel_bucket`, and
  beyond 1/relative_bucket buckets the step doubles each octave
  (`_bucket_geo`), so the number of distinct XLA programs grows
  logarithmically with utterance length while padding waste stays bounded.
"""

import time
from dataclasses import dataclass
from functools import partial
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.flow import CausalFlow
from cosyvoice_tpu.models.hift import HiFTGenerator
from cosyvoice_tpu.models.llm import Qwen2LM, TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT
from cosyvoice_tpu.utils.profiling import StageTimer

LOG_SILENCE = -11.512925  # ln(1e-5): matcha mel floor, used for mel padding


@dataclass
class SessionState:
    """Per-utterance streaming caches (reference hift_cache_dict)."""

    hift_mel_cache: Optional[np.ndarray] = None  # [1, 8, 80]
    hift_source_cache: Optional[np.ndarray] = None  # [1, 8*480]
    hift_speech_cache: Optional[np.ndarray] = None  # [1, 8*480]
    # v3 (pure-causal vocoder): cumulative mel + emitted-sample offset
    mel_cumulative: Optional[np.ndarray] = None
    speech_offset: int = 0
    # incremental streaming flow (SURVEY §5.7): carried KV/conv state + the
    # number of (prompt + body) tokens already consumed; arena size mirrors
    # the device state host-side so growth never needs a device fetch
    flow_state: Optional[dict] = None
    flow_pos: int = 0
    flow_arena: int = 0


def _bucket(n: int, b: int) -> int:
    return ((n + b - 1) // b) * b


def _bucket_geo(n: int, b: int, rel: float) -> int:
    """Length-bucket with geometric granularity: flat multiples of `b` while
    `rel*n < b`, then the step doubles each octave (largest power of two
    <= rel*n). Padding waste stays < `rel` while the number of distinct
    padded shapes — each one an XLA compile — grows logarithmically with max
    length instead of linearly. Sampled output lengths scatter in a serving
    mix (RAS stops at a different step per request), and through a remote-TPU
    tunnel one cold program costs minutes: a bounded program universe is what
    lets aot_warmup + the persistent compile cache actually cover it."""
    if rel <= 0:
        return _bucket(n, b)
    step = 1 << max(int(rel * n).bit_length() - 1, 0)  # largest pow2 <= rel*n
    return _bucket(n, max(step, b))


class _Prefetcher:
    """Drains a token generator on a daemon thread (bounded queue) so the LM's
    decode blocks and token->wav dispatch/transfers overlap. Through a
    remote-TPU tunnel each stage pays round-trip latency; serial pulls stack
    those RTTs on the first-chunk path, prefetch hides them behind each
    other."""

    _END = object()

    def __init__(self, gen, depth: int = 4):
        import queue
        import threading

        self._q = queue.Queue(maxsize=depth)
        self._exc = None

        def run():
            try:
                for item in gen:
                    self._q.put(item)
            except BaseException as e:  # re-raised on the consumer thread
                self._exc = e
            finally:
                self._q.put(self._END)

        threading.Thread(target=run, daemon=True, name="lm-prefetch").start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            if self._exc is not None:
                raise self._exc
            raise StopIteration
        return item

    def drain_nowait(self):
        """Pop every block already buffered, without blocking. The engine
        drains before computing the adaptive next hop so `n_pending` counts
        the full LM backlog (the reference consumer's measure), not just the
        tokens that happened to be pulled already."""
        import queue

        items = []
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is self._END:
                self._q.put(item)  # keep the sentinel for __next__
                break
            items.append(item)
        return items


class CosyVoice2Engine:
    # class-level defaults: objects that borrow tts() without running
    # __init__ (RemoteEngine, test doubles) get the conservative paths
    speculative_first_chunk = False
    incremental_flow = False
    flow_arena0 = 256
    # hybrid streaming-flow crossover (SURVEY §5.7): below this many
    # (prompt + body) tokens a full-prefix recompute chunk costs LESS on the
    # TPU than an incremental chunk over the KV arenas — one recompute pass
    # at short prefixes is a single well-shaped program (~offline t2w cost),
    # while an arena chunk pays ~20 blocks x 10 Euler steps of small
    # latency-bound attention reads over the whole arena (measured on v5e:
    # recompute ~0.1 ms/mel-row of prefix vs arena chunk ~13 ms + 0.06
    # ms/mel-row of arena). Sessions switch to the incremental path with one
    # catch-up chunk (cost = one recompute pass) when the prefix crosses the
    # threshold; beyond it each chunk is O(chunk * prefix) instead of the
    # reference's O(prefix^2) growth (cli/model.py:294-303).
    flow_incr_min_tok = 320
    # beyond this many (prompt+body) tokens the incremental path hands the
    # session back to full-prefix recompute: arenas stop growing (~82 s of
    # audio; the espnet rel-PE table and the fixed noise buffer bound the
    # usable range, and sentence splitting keeps real segments far below)
    flow_arena_max = 2048

    def __init__(
        self,
        lm: Qwen2LM,
        flow: CausalFlow,
        hift: HiFTGenerator,
        lm_params,
        flow_params,
        hift_params,
        token_hop_len: int = 25,
        token_bucket: int = 64,
        mel_bucket: int = 32,
        relative_bucket: float = 0.125,
        seed: int = 1986,
        hop_policy: str = "doubling",
        incremental_flow: bool = True,
        flow_arena0: int = 256,
        flow_incr_min_tok: int = 320,
    ):
        self.lm = lm
        self.flow = flow
        self.hift = hift
        self.lm_params = lm_params
        self.flow_params = flow_params
        self.hift_params = hift_params
        self.token_hop_len = token_hop_len
        self.token_max_hop_len = 4 * token_hop_len
        self.stream_scale_factor = 2
        assert hop_policy in ("doubling", "exponential", "time_based"), hop_policy
        self.hop_policy = hop_policy
        self.pre_lookahead_len = flow.cfg.pre_lookahead_len
        self.token_mel_ratio = flow.cfg.token_mel_ratio
        self.token_rate = 25  # Hz (cosyvoice2.yaml:13-14; time_based policy)
        self.wav_hop = hift.cfg.hop_total  # samples per mel frame (480 @24k)
        self.mel_cache_len = 8
        self.source_cache_len = self.mel_cache_len * self.wav_hop
        self.speech_window = np.hamming(2 * self.source_cache_len)
        self.token_bucket = token_bucket
        self.mel_bucket = mel_bucket
        self.relative_bucket = relative_bucket  # 0 disables geometric buckets
        self.seed = seed
        self.scheduler = None  # optional LMBatchScheduler (continuous batching)
        self._rng0 = None  # cached PRNGKey(seed): building one is a device call
        self.timer = StageTimer()  # per-stage wall-time accounting (SURVEY §5.1)

        self._jit_flow = jax.jit(
            lambda p, tok, tl, conds, emb, ctx, streaming: self.flow.inference(
                p, tok, tl, conds, emb, context_token=ctx, streaming=streaming
            ),
            static_argnames=("streaming",),
        )
        self._jit_hift = jax.jit(
            lambda p, mel, rng, cache_source: self.hift.apply(
                p, mel, rng, cache_source=cache_source, method="inference"
            ),
        )
        # fused offline token->wav: flow + mel slice + vocoder in ONE device
        # program — the mel never leaves the chip (one upload, one wav
        # download; critical when the host<->device link has latency).
        # prompt_mel_len is TRACED (the prompt is removed with a roll + mask,
        # not a static slice), so every prompt length in a serving mix shares
        # one compiled program per token bucket.
        self._jit_t2w_fused = jax.jit(self._t2w_fused_impl)
        # fused STREAMING chunk: flow prefix recompute + chunk slice + HiFT
        # cache splice + vocoder + cross-fade in ONE device program, with the
        # mel/source/speech caches living on device between chunks — one
        # host<->device round trip per streaming chunk instead of four.
        self.fused_stream = True
        self._jit_t2w_stream = jax.jit(
            self._t2w_stream_impl, static_argnames=("chunk_mel", "first")
        )
        self._jit_t2w_final = jax.jit(
            self._t2w_final_impl, static_argnames=("chunk_mel", "first")
        )
        # incremental streaming flow: carried KV arenas + conv caches instead
        # of the reference's O(T^2) full-prefix recompute (SURVEY §5.7). Each
        # chunk is ONE device program: flow chunk -> emit slice -> HiFT ->
        # cross-fade, with the flow state resident on device between chunks.
        self.incremental_flow = incremental_flow and getattr(flow.cfg, "estimator_type", "unet") in ("unet", "dit")
        self.flow_arena0 = flow_arena0
        self.flow_incr_min_tok = flow_incr_min_tok
        self._jit_t2w_stream_incr = jax.jit(
            self._t2w_stream_incr_impl, static_argnames=("chunk_mel", "first")
        )
        self._jit_flow_chunk_incr = jax.jit(
            lambda fp, tok, ctx, conds, emb, st, pos, rn: self.flow.inference_chunk(
                fp, tok, ctx, conds, emb, st, pos, rn
            )
        )
        self._jit_grow_flow = jax.jit(
            self.flow.grow_stream_state, static_argnames=("new_arena_tok",)
        ) if self.incremental_flow else None
        self._flow_state0 = {}  # arena -> jitted zero-state builder
        # speculative fused first chunk: LM prefill + first decode block(s) +
        # incremental flow chunk + HiFT in ONE device program — the whole
        # first-chunk path costs one dispatch + one fetch (1 tunnel RTT)
        # instead of ~8 serialized round trips (VERDICT r4 weak #2)
        self.speculative_first_chunk = True
        self._jit_first_chunk = jax.jit(
            self._first_chunk_impl,
            static_argnames=("n1", "this_hop", "arena_lm", "block_size"),
        )


    def _seed_key(self, seed=None):
        """PRNGKey(self.seed), built once (PRNGKey creation dispatches to the
        device — a pure round trip when repeated per chunk)."""
        if seed is not None and seed != self.seed:
            return jax.random.PRNGKey(seed)
        if self._rng0 is None:
            self._rng0 = jax.random.PRNGKey(self.seed)
        return self._rng0

    def _t2w_fused_impl(self, flow_params, hift_params, tok, token_len, conds, emb, rng, prompt_mel_len):
        mel = self.flow.inference(flow_params, tok, token_len, conds, emb, streaming=False)
        # drop the prompt mel with a traced-shift roll (shape stays static, so
        # one program serves every prompt length); the wrapped tail lands in
        # the masked region below
        mel = jnp.roll(mel, -prompt_mel_len, axis=1)
        # silence out the padded tail so the vocoder tail stays clean
        valid = jnp.arange(mel.shape[1])[None, :, None] < (token_len[0] * self.token_mel_ratio - prompt_mel_len)
        mel = jnp.where(valid, mel, LOG_SILENCE)
        wav, _ = self.hift.apply(hift_params, mel, rng, method="inference")
        return wav

    def _t2w_stream_impl(
        self,
        flow_params,
        hift_params,
        tok,
        token_len,
        conds,
        emb,
        ctx,
        rng,
        mel_cache,      # [1, mel_cache_len, 80] (zeros on first chunk)
        source_cache,   # [1, source_cache_len]
        speech_cache,   # [1, source_cache_len]
        token_offset,   # [] traced
        prompt_mel_len,  # [] traced: no recompile per prompt length
        chunk_mel: int,
        first: bool,
    ):
        """One fused streaming chunk: flow prefix recompute -> slice the new
        chunk's mel -> splice HiFT caches -> vocode -> hamming cross-fade.
        Everything (incl. the carried caches) stays on device; only the chunk
        wav crosses to the host."""
        mel_full = self.flow.inference(flow_params, tok, token_len, conds, emb, context_token=ctx, streaming=True)
        start = prompt_mel_len + token_offset * self.token_mel_ratio
        mel_new = jax.lax.dynamic_slice(mel_full, (0, start, 0), (1, chunk_mel, 80))
        if first:
            mel = mel_new
            wav, src = self.hift.apply(hift_params, mel, rng, method="inference")
        else:
            mel = jnp.concatenate([mel_cache, mel_new], axis=1)
            wav, src = self.hift.apply(hift_params, mel, rng, cache_source=source_cache, method="inference")
            n = self.source_cache_len
            w = jnp.asarray(self.speech_window)
            head = wav[:, :n] * w[n:] + speech_cache * w[:n]
            wav = jnp.concatenate([head, wav[:, n:]], axis=1)
        new_mel_cache = mel[:, -self.mel_cache_len :]
        new_source_cache = src[:, -self.source_cache_len :]
        new_speech_cache = wav[:, -self.source_cache_len :]
        return wav[:, : -self.source_cache_len], new_mel_cache, new_source_cache, new_speech_cache

    def _t2w_final_impl(
        self,
        flow_params,
        hift_params,
        tok,            # [1, Lpad] full prompt+body tokens (finalize: no lookahead)
        token_len,      # [1] true token count
        conds,
        emb,
        rng,
        mel_cache,
        source_cache,
        speech_cache,
        emit_start,     # [] traced: first emitted mel row (prompt_mel + offset*r)
        real_mel,       # [] traced: true remaining mel rows
        chunk_mel: int,  # bucketed emit width (rows beyond real_mel -> silence)
        first: bool,
    ):
        """Fused streaming FINALIZE chunk (recompute path): flow over the full
        prefix -> slice the remaining mel -> splice HiFT caches -> vocode ->
        cross-fade, in ONE device program (the host path was flow + vocode +
        fade = 2 programs + 2 fetches). Rows beyond real_mel are masked to
        log-silence exactly like the host _vocode bucket pad, so the valid
        samples match the unfused path. Returns the FULL tail wav (finalize
        holds nothing back); the host slices to the true length."""
        mel_full = self.flow.inference(
            flow_params, tok, token_len, conds, emb, context_token=None, streaming=True
        )
        pad = jnp.full((1, chunk_mel, 80), LOG_SILENCE, mel_full.dtype)
        mel_ext = jnp.concatenate([mel_full, pad], axis=1)
        mel_new = jax.lax.dynamic_slice(mel_ext, (0, emit_start, 0), (1, chunk_mel, 80))
        rows = jnp.arange(chunk_mel)[None, :, None]
        mel_new = jnp.where(rows < real_mel, mel_new, LOG_SILENCE)
        if first:
            wav, _ = self.hift.apply(hift_params, mel_new, rng, method="inference")
        else:
            mel = jnp.concatenate([mel_cache, mel_new], axis=1)
            wav, _ = self.hift.apply(
                hift_params, mel, rng, cache_source=source_cache, method="inference"
            )
            n = self.source_cache_len
            w = jnp.asarray(self.speech_window)
            head = wav[:, :n] * w[n:] + speech_cache * w[:n]
            wav = jnp.concatenate([head, wav[:, n:]], axis=1)
        return wav

    def _t2w_stream_incr_impl(
        self,
        flow_params,
        hift_params,
        tok_chunk,      # [1, n_pad] new tokens (prompt rows included on the first chunk)
        ctx,            # [1, la] lookahead tokens
        conds_chunk,    # [1, n_pad*r, 80] prompt-mel slice at this chunk's offset
        emb,
        flow_state,
        pos_tok,        # [] traced: tokens already consumed
        real_n,         # [] traced: true new tokens
        emit_start,     # [] traced: first emitted mel row within the chunk
        rng,
        mel_cache,
        source_cache,
        speech_cache,
        chunk_mel: int,
        first: bool,
    ):
        """One fused INCREMENTAL streaming chunk: flow chunk over carried KV
        arenas -> emit slice -> HiFT cache splice -> vocode -> cross-fade.
        O(chunk * prefix) instead of the recompute's O(prefix^2); everything
        stays on device, only the chunk wav crosses to the host."""
        mel_chunk, flow_state = self.flow.inference_chunk(
            flow_params, tok_chunk, ctx, conds_chunk, emb, flow_state, pos_tok, real_n
        )
        mel_new = jax.lax.dynamic_slice(mel_chunk, (0, emit_start, 0), (1, chunk_mel, 80))
        if first:
            mel = mel_new
            wav, src = self.hift.apply(hift_params, mel, rng, method="inference")
        else:
            mel = jnp.concatenate([mel_cache, mel_new], axis=1)
            wav, src = self.hift.apply(hift_params, mel, rng, cache_source=source_cache, method="inference")
            n = self.source_cache_len
            w = jnp.asarray(self.speech_window)
            head = wav[:, :n] * w[n:] + speech_cache * w[:n]
            wav = jnp.concatenate([head, wav[:, n:]], axis=1)
        new_mel_cache = mel[:, -self.mel_cache_len :]
        new_source_cache = src[:, -self.source_cache_len :]
        new_speech_cache = wav[:, -self.source_cache_len :]
        return wav[:, : -self.source_cache_len], new_mel_cache, new_source_cache, new_speech_cache, flow_state

    def _first_chunk_impl(
        self,
        lm_params,
        flow_params,
        hift_params,
        ids_d,          # [1, pad_T] LM prompt ids (padded)
        types_d,        # [1, pad_T]
        prompt_len,     # [1] true LM prompt length
        min_l,          # [1] int32
        keys,           # [n1, 2] per-block sampler keys (generate's schedule)
        flow_buf,       # [1, n_pad] flow prompt speech tokens at [0, lp), zero tail
        lp,             # [] traced: flow prompt token count
        conds,          # [1, n_pad*r, 80]
        emb,            # [1, 192]
        flow_rng,       # hift noise key
        n1: int,
        this_hop: int,
        arena_lm: int,
        block_size: int,
        stacked=None,
    ):
        """Speculative fused first chunk (one device program): LM prefill ->
        n1 decode blocks -> streaming flow over the prompt + first this_hop
        tokens -> HiFT. The host verifies the fetched tokens afterwards (a
        stop id inside the first this_hop+la tokens means the real stream
        would not have emitted this chunk) and discards on mismatch. Uses
        generate()'s exact key schedule, so on success the token stream
        continues bit-identically via lm.generate_continue."""
        c = self.lm.cfg
        cache = self.lm.init_cache(1, length=arena_lm)
        logits, cache = self.lm.module.apply(
            lm_params, ids_d, types_d, prompt_len, cache, method="prefill"
        )
        cur = prompt_len
        recent = jnp.full((1, c.win_size), -1, jnp.int32)
        ndec = jnp.zeros((1,), jnp.int32)
        fin = jnp.zeros((1,), bool)
        toks_all = []
        for i in range(n1):
            kw = dict(stacked=stacked) if stacked is not None else {}
            toks, logits, cache, cur, recent, ndec, fin = self.lm._decode_block_impl(
                lm_params, keys[i], cache, cur, logits, recent, ndec, min_l, fin, block_size, **kw
            )
            toks_all.append(toks)
        gen = jnp.concatenate(toks_all, axis=1)  # [1, n1*block_size]

        la = self.pre_lookahead_len
        r = self.token_mel_ratio
        safe = jnp.minimum(gen, self.flow.cfg.vocab_size - 1)  # post-stop eos fills
        tok_chunk = jax.lax.dynamic_update_slice(flow_buf, safe[:, :this_hop], (0, lp))
        ctx = safe[:, this_hop : this_hop + la]
        # first chunk uses the full-prefix recompute flow (one well-shaped
        # program; see flow_incr_min_tok — at first-chunk prefixes the
        # recompute beats an arena chunk, and the session stays on the
        # recompute path until it crosses the threshold)
        mel_full = self.flow.inference(
            flow_params, tok_chunk, (lp + this_hop).reshape(1), conds, emb,
            context_token=ctx, streaming=True,
        )
        emit_start = lp * r
        mel = jax.lax.dynamic_slice(mel_full, (0, emit_start, 0), (1, this_hop * r, 80))
        wav, src = self.hift.apply(hift_params, mel, flow_rng, method="inference")
        mel_cache = mel[:, -self.mel_cache_len :]
        source_cache = src[:, -self.source_cache_len :]
        speech_cache = wav[:, -self.source_cache_len :]
        lm_state = (cache, cur, logits, recent, ndec, fin)
        # pack tokens + wav into ONE f32 array: the host verifies the tokens
        # and emits the wav from a single fetch (one tunnel round trip)
        packed = jnp.concatenate(
            [gen.astype(jnp.float32), wav[:, : -self.source_cache_len].astype(jnp.float32)],
            axis=1,
        )
        return packed, mel_cache, source_cache, speech_cache, lm_state

    def _try_first_chunk_fast(
        self, state, ids, types, min_len, max_len, prompt_token, prompt_feat, embedding, rng
    ):
        """Host wrapper for the speculative fused first chunk.

        Returns None when the fast path does not apply, else a dict:
          wav            first-chunk audio (verified)
          produced       host list of generated tokens so far (stop-trimmed)
          gen_done       True when a stop id already appeared
          token_gen      continuation generator (None when gen_done)
          token_offset   tokens consumed by the emitted chunk
        On speculation failure (stop id inside the first chunk's tokens) the
        dict carries wav=None and the untouched tokens so the caller falls
        back to the standard path with nothing lost but the wasted program.
        """
        from cosyvoice_tpu.models.llm import _split_chain

        c = self.lm.cfg
        block = c.block_size
        hop = self.token_hop_len
        Lp = len(prompt_token)
        prompt_pad = int(np.ceil(Lp / hop) * hop - Lp)
        this_hop = hop + prompt_pad
        la = self.pre_lookahead_len
        r = self.token_mel_ratio
        need = this_hop + la
        n1 = -(-need // block)
        if max_len < need or c.repetition_penalty != 1.0:
            return None

        # LM prompt padding + capacity guard (mirrors lm.generate)
        T = len(ids)
        bucket = min(128, max(c.qwen.max_cache_len // 4, 8))
        pad_T = ((T + bucket - 1) // bucket) * bucket
        capacity = ((c.qwen.max_cache_len - pad_T - 1) // block) * block
        if max_len > capacity:
            max_len = max(capacity, 0)
            min_len = min(min_len, max_len)
            if max_len < need:
                return None
        ids_d = np.zeros((1, pad_T), np.int32)
        types_d = np.full((1, pad_T), TYPE_SPEECH, np.int32)
        ids_d[0, :T] = ids
        types_d[0, :T] = types

        n_blocks = max(1, -(-max_len // block) + 1)
        _, keys = _split_chain(rng, n_blocks)
        arena_lm = self.lm.arena_bucket(pad_T + n1 * block + 1)

        n_pad = _bucket(Lp + this_hop + la, 16)  # room for the lookahead scatter
        flow_buf = np.zeros((1, n_pad), np.int32)
        flow_buf[0, :Lp] = prompt_token
        pm = prompt_feat.shape[1]
        conds = np.zeros((1, n_pad * r, 80), np.float32)
        conds[0, :pm] = prompt_feat[0]
        min_l = jnp.asarray([min_len], jnp.int32)

        # int4p whole-step pack: _decode_pack only reads cache SHAPES for its
        # gating, so a ShapeDtypeStruct probe avoids materializing an arena
        qc = c.qwen
        probe = (jax.ShapeDtypeStruct((qc.num_layers, 1, arena_lm, qc.num_kv_heads, qc.head_dim), jnp.bfloat16),) * 2
        pack = self.lm._decode_pack(self.lm_params, probe)
        t0 = time.perf_counter()
        packed, mc, sc, spc, lm_state = self._jit_first_chunk(
            self.lm_params, self.flow_params, self.hift_params,
            jnp.asarray(ids_d), jnp.asarray(types_d), jnp.asarray([T]),
            min_l, keys[:n1], jnp.asarray(flow_buf), jnp.asarray(Lp),
            jnp.asarray(conds), jnp.asarray(embedding), self._seed_key(),
            n1=n1, this_hop=this_hop, arena_lm=arena_lm,
            block_size=block, stacked=pack,
        )
        # ONE fetch: [n1*block sampled token ids | first-chunk wav]
        arr = np.asarray(packed[0])
        gen0 = arr[: n1 * block].astype(np.int32)
        wav = arr[None, n1 * block :].astype(np.float32)
        stop_idx = np.nonzero(gen0 >= c.speech_token_size)[0]
        self.timer.add("first_chunk_fused", time.perf_counter() - t0)

        if len(stop_idx) and stop_idx[0] < need:
            # the real stream would not emit this chunk: discard, fall back
            return {
                "wav": None,
                "produced": gen0[: stop_idx[0]].tolist()[: max_len],
                "gen_done": True,
            }
        produced = (gen0[: stop_idx[0]] if len(stop_idx) else gen0).tolist()[: max_len]
        gen_done = bool(len(stop_idx)) or len(produced) >= max_len
        state.hift_mel_cache, state.hift_source_cache, state.hift_speech_cache = mc, sc, spc
        token_gen = None
        if not gen_done:
            token_gen = self.lm.generate_continue(
                self.lm_params, lm_state, min_l, max_len, keys,
                key_start=n1, produced0=len(produced), cur_host0=pad_T + n1 * block,
            )
        return {
            "wav": wav,
            "produced": produced,
            "gen_done": gen_done,
            "token_gen": token_gen,
            "token_offset": this_hop,
        }

    def _flow_stream_state(self, arena: int):
        """Fresh zero flow-stream state on device (ONE jitted program per
        arena size — eager zeros would be ~250 op dispatches)."""
        fn = self._flow_state0.get(arena)
        if fn is None:
            fn = jax.jit(lambda: self.flow.stream_state(1, arena))
            self._flow_state0[arena] = fn
        return fn()

    def _ensure_flow_capacity(self, state, need_tok: int):
        """Grow the session's flow arenas to cover need_tok positions."""
        if state.flow_state is None:
            arena = self.flow_arena0
            while arena < need_tok:
                arena *= 2
            state.flow_state = self._flow_stream_state(arena)
            state.flow_arena = arena
            state.flow_pos = 0
        elif state.flow_arena < need_tok:
            arena = state.flow_arena
            while arena < need_tok:
                arena *= 2
            state.flow_state = self._jit_grow_flow(state.flow_state, new_arena_tok=arena)
            state.flow_arena = arena

    def _stream_chunk_incr(self, state, tokens, prompt_token, prompt_feat, embedding, token_offset, this_hop):
        """Host wrapper for the incremental streaming chunk."""
        t_start = time.perf_counter()
        la = self.pre_lookahead_len
        r = self.token_mel_ratio
        all_tokens = np.concatenate([prompt_token, tokens]).astype(np.int32)
        consumed = state.flow_pos
        n_real = len(prompt_token) + token_offset + this_hop - consumed
        ctx = jnp.asarray(all_tokens[None, consumed + n_real : consumed + n_real + la])
        n_pad = _bucket(n_real, 16)
        chunk = np.zeros((1, n_pad), np.int32)
        chunk[0, :n_real] = all_tokens[consumed : consumed + n_real]
        pm = prompt_feat.shape[1]
        conds = np.zeros((1, n_pad * r, 80), np.float32)
        lo = consumed * r
        if lo < pm:
            k = min(pm - lo, n_pad * r)
            conds[0, :k] = prompt_feat[0, lo : lo + k]
        emit_start = (n_real - this_hop) * r
        self._ensure_flow_capacity(state, consumed + n_pad)

        first = state.hift_mel_cache is None
        zeros_mel = jnp.zeros((1, self.mel_cache_len, 80), jnp.float32)
        zeros_src = jnp.zeros((1, self.source_cache_len), jnp.float32)
        wav, mc, sc, spc, state.flow_state = self._jit_t2w_stream_incr(
            self.flow_params,
            self.hift_params,
            jnp.asarray(chunk),
            ctx,
            jnp.asarray(conds),
            jnp.asarray(embedding),
            state.flow_state,
            jnp.asarray(consumed),
            jnp.asarray(n_real),
            jnp.asarray(emit_start),
            self._seed_key(),
            state.hift_mel_cache if not first else zeros_mel,
            state.hift_source_cache if not first else zeros_src,
            state.hift_speech_cache if not first else zeros_src,
            chunk_mel=this_hop * r,
            first=first,
        )
        state.flow_pos = consumed + n_real
        state.hift_mel_cache, state.hift_source_cache, state.hift_speech_cache = mc, sc, spc
        out = np.asarray(wav)
        self.timer.add("stream_chunk", time.perf_counter() - t_start)
        return out

    def _finalize_incr(self, state, tokens, prompt_token, prompt_feat, embedding, token_offset):
        """Final incremental chunk: run the remaining tokens through the flow
        state (no lookahead), then the engine's normal bucketed vocode +
        fade path on the emitted mel."""
        t_start = time.perf_counter()
        r = self.token_mel_ratio
        all_tokens = np.concatenate([prompt_token, tokens]).astype(np.int32)
        consumed = state.flow_pos
        rem = len(all_tokens) - consumed
        if rem > 0:
            n_pad = _bucket(rem, 16)
            chunk = np.zeros((1, n_pad), np.int32)
            chunk[0, :rem] = all_tokens[consumed:]
            pm = prompt_feat.shape[1]
            conds = np.zeros((1, n_pad * r, 80), np.float32)
            lo = consumed * r
            if lo < pm:
                k = min(pm - lo, n_pad * r)
                conds[0, :k] = prompt_feat[0, lo : lo + k]
            self._ensure_flow_capacity(state, consumed + n_pad)
            mel_chunk, state.flow_state = self._jit_flow_chunk_incr(
                self.flow_params, jnp.asarray(chunk), None, jnp.asarray(conds),
                jnp.asarray(embedding), state.flow_state, jnp.asarray(consumed), jnp.asarray(rem),
            )
            state.flow_pos = consumed + rem
            mel = np.asarray(mel_chunk)[:, : rem * r]
        else:
            mel = np.zeros((1, 0, 80), np.float32)
        self.timer.add("flow", time.perf_counter() - t_start)

        if mel.shape[1] == 0 and state.hift_mel_cache is None:
            return np.zeros((1, 0), np.float32)
        if state.hift_mel_cache is not None:
            mel = np.concatenate([np.asarray(state.hift_mel_cache), mel], axis=1)
            cache_source = np.asarray(state.hift_source_cache)
        else:
            cache_source = np.zeros((1, 0), np.float32)
        wav, _ = self._vocode(mel, cache_source, self._seed_key())
        if state.hift_speech_cache is not None:
            wav = self._fade(wav, np.asarray(state.hift_speech_cache))
        return wav

    def _flow_mel_incr(self, state, body_tokens, ctx, prompt_feat, embedding):
        """Incremental flow on the un-consumed tail of `body_tokens`
        (prompt + generated body, NO lookahead); ctx = [1, la] lookahead
        tokens or None (finalize). Returns the new mel rows
        [1, n_real*r, 80] (host) and advances state.flow_pos."""
        t_start = time.perf_counter()
        r = self.token_mel_ratio
        consumed = state.flow_pos
        n_real = len(body_tokens) - consumed
        if n_real <= 0:
            return np.zeros((1, 0, 80), np.float32)
        n_pad = _bucket(n_real, 16)
        chunk = np.zeros((1, n_pad), np.int32)
        chunk[0, :n_real] = body_tokens[consumed:]
        pm = prompt_feat.shape[1]
        conds = np.zeros((1, n_pad * r, 80), np.float32)
        lo = consumed * r
        if lo < pm:
            k = min(pm - lo, n_pad * r)
            conds[0, :k] = prompt_feat[0, lo : lo + k]
        self._ensure_flow_capacity(state, consumed + n_pad)
        mel, state.flow_state = self._jit_flow_chunk_incr(
            self.flow_params, jnp.asarray(chunk), ctx, jnp.asarray(conds),
            jnp.asarray(embedding), state.flow_state, jnp.asarray(consumed), jnp.asarray(n_real),
        )
        state.flow_pos = consumed + n_real
        out = np.asarray(mel)[:, : n_real * r]
        self.timer.add("flow", time.perf_counter() - t_start)
        return out

    def _stream_chunk_fused(self, state, tokens, prompt_token, prompt_feat, embedding, token_offset, this_hop):
        """Device-resident streaming chunk (non-final). Returns host wav."""
        t_start = time.perf_counter()
        all_tokens = np.concatenate([prompt_token, tokens])
        L = len(all_tokens)
        la = self.pre_lookahead_len
        body, ctx = all_tokens[:-la], jnp.asarray(all_tokens[None, -la:].astype(np.int32))
        Lpad = _bucket_geo(L, self.token_bucket, self.relative_bucket)
        tok = np.zeros((1, Lpad), np.int32)
        tok[0, : len(body)] = body
        conds = np.zeros((1, Lpad * self.token_mel_ratio, 80), np.float32)
        conds[:, : prompt_feat.shape[1]] = prompt_feat

        first = state.hift_mel_cache is None
        zeros_mel = jnp.zeros((1, self.mel_cache_len, 80), jnp.float32)
        zeros_src = jnp.zeros((1, self.source_cache_len), jnp.float32)
        wav, mc, sc, spc = self._jit_t2w_stream(
            self.flow_params,
            self.hift_params,
            jnp.asarray(tok),
            jnp.asarray([len(body)]),
            jnp.asarray(conds),
            jnp.asarray(embedding),
            ctx,
            self._seed_key(),
            state.hift_mel_cache if not first else zeros_mel,
            state.hift_source_cache if not first else zeros_src,
            state.hift_speech_cache if not first else zeros_src,
            jnp.asarray(token_offset),
            jnp.asarray(prompt_feat.shape[1]),
            chunk_mel=this_hop * self.token_mel_ratio,
            first=first,
        )
        state.hift_mel_cache, state.hift_source_cache, state.hift_speech_cache = mc, sc, spc
        out = np.asarray(wav)
        self.timer.add("stream_chunk", time.perf_counter() - t_start)
        return out

    def _finalize_fused(self, state, tokens, prompt_token, prompt_feat, embedding, token_offset):
        """Host wrapper for the fused recompute finalize chunk."""
        t_start = time.perf_counter()
        all_tokens = np.concatenate([prompt_token, tokens]).astype(np.int32)
        L = len(all_tokens)
        r = self.token_mel_ratio
        rem = len(tokens) - token_offset
        first = state.hift_mel_cache is None
        Lpad = _bucket_geo(L, self.token_bucket, self.relative_bucket)
        tok = np.zeros((1, Lpad), np.int32)
        tok[0, :L] = all_tokens
        conds = np.zeros((1, Lpad * r, 80), np.float32)
        conds[:, : prompt_feat.shape[1]] = prompt_feat
        # pad the vocoded mel to EXACTLY the host _vocode path's bucket: the
        # v2 HiFT is non-causal, so silence pad rows bleed into the valid
        # tail within the receptive field — matching the generic path bit-for
        # -bit requires matching its pad width, not just padding "enough"
        cache_rows = 0 if first else self.mel_cache_len
        total_rows = _bucket_geo(cache_rows + rem * r, self.mel_bucket, self.relative_bucket)
        chunk_mel = total_rows - cache_rows
        zeros_mel = jnp.zeros((1, self.mel_cache_len, 80), jnp.float32)
        zeros_src = jnp.zeros((1, self.source_cache_len), jnp.float32)
        wav = self._jit_t2w_final(
            self.flow_params,
            self.hift_params,
            jnp.asarray(tok),
            jnp.asarray([L]),
            jnp.asarray(conds),
            jnp.asarray(embedding),
            self._seed_key(),
            state.hift_mel_cache if not first else zeros_mel,
            state.hift_source_cache if not first else zeros_src,
            state.hift_speech_cache if not first else zeros_src,
            jnp.asarray(prompt_feat.shape[1] + token_offset * r),
            jnp.asarray(rem * r),
            chunk_mel=chunk_mel,
            first=first,
        )
        valid = ((0 if first else self.mel_cache_len) + rem * r) * self.wav_hop
        out = np.asarray(wav)[:, :valid]
        self.timer.add("stream_chunk", time.perf_counter() - t_start)
        return out

    def synthesize_offline(self, tokens, prompt_token, prompt_feat, embedding, speed: float = 1.0):
        """Single fused device call for the non-streaming path."""
        if speed != 1.0 or len(tokens) == 0:
            # speed change interpolates mel on host; fall back to the 2-call path
            from cosyvoice_tpu.runtime.engine import SessionState

            return self.token2wav(
                SessionState(), tokens, prompt_token, prompt_feat, embedding, 0, False, True, speed
            )
        all_tokens = np.concatenate([prompt_token, tokens]).astype(np.int32)
        L = len(all_tokens)
        Lpad = _bucket_geo(L, self.token_bucket, self.relative_bucket)
        tok = np.zeros((1, Lpad), np.int32)
        tok[0, :L] = all_tokens
        conds = np.zeros((1, Lpad * self.token_mel_ratio, 80), np.float32)
        conds[:, : prompt_feat.shape[1]] = prompt_feat
        t0 = time.perf_counter()
        wav = self._jit_t2w_fused(
            self.flow_params, self.hift_params, jnp.asarray(tok), jnp.asarray([L]),
            jnp.asarray(conds), jnp.asarray(embedding), self._seed_key(),
            jnp.asarray(prompt_feat.shape[1]),
        )
        n_valid = (L - len(prompt_token)) * self.token_mel_ratio * self.wav_hop
        out = np.asarray(wav)[:, :n_valid]
        self.timer.add("t2w_fused", time.perf_counter() - t0)
        return out

    # ------------------------------------------------------------------
    def _flow_chunk(
        self,
        all_tokens: np.ndarray,  # [L] prompt+generated tokens (with lookahead tail if not finalize)
        prompt_feat: np.ndarray,  # [1, Lp_mel, 80]
        embedding: np.ndarray,  # [1, 192]
        streaming: bool,
        finalize: bool,
    ) -> np.ndarray:
        """Run flow on the full prefix; returns mel [1, body_len*r, 80] where
        body_len = L - (0 if finalize else lookahead)."""
        t_start = time.perf_counter()
        L = len(all_tokens)
        la = self.pre_lookahead_len
        if finalize:
            body, ctx = all_tokens, None
        else:
            body, ctx = all_tokens[:-la], jnp.asarray(all_tokens[None, -la:].astype(np.int32))
        Lpad = _bucket_geo(L, self.token_bucket, self.relative_bucket)  # leaves >= la slack beyond body
        tok = np.zeros((1, Lpad), np.int32)
        tok[0, : len(body)] = body
        conds = np.zeros((1, Lpad * self.token_mel_ratio, 80), np.float32)
        conds[:, : prompt_feat.shape[1]] = prompt_feat
        mel = self._jit_flow(
            self.flow_params,
            jnp.asarray(tok),
            jnp.asarray([len(body)]),
            jnp.asarray(conds),
            jnp.asarray(embedding),
            ctx,
            streaming,
        )
        out = np.asarray(mel)[:, : len(body) * self.token_mel_ratio]
        self.timer.add("flow", time.perf_counter() - t_start)
        return out

    def _vocode(self, mel: np.ndarray, cache_source: np.ndarray, rng) -> tuple:
        """mel: [1, T, 80] -> (wav [1, T*480], source [1, T*480]); buckets T."""
        t_start = time.perf_counter()
        T = mel.shape[1]
        Tpad = _bucket_geo(T, self.mel_bucket, self.relative_bucket)
        mel_p = np.full((1, Tpad, 80), LOG_SILENCE, np.float32)
        mel_p[:, :T] = mel
        wav, src = self._jit_hift(self.hift_params, jnp.asarray(mel_p), rng, jnp.asarray(cache_source))
        out = np.asarray(wav)[:, : T * self.wav_hop], np.asarray(src)[:, : T * self.wav_hop]
        self.timer.add("vocoder", time.perf_counter() - t_start)
        return out

    # ------------------------------------------------------------------
    def token2wav(
        self,
        state: SessionState,
        tokens: np.ndarray,  # [L] generated speech tokens so far (incl lookahead when not finalize)
        prompt_token: np.ndarray,  # [Lp]
        prompt_feat: np.ndarray,  # [1, Lp*2, 80]
        embedding: np.ndarray,  # [1, 192]
        token_offset: int,
        stream: bool = False,
        finalize: bool = False,
        speed: float = 1.0,
    ) -> np.ndarray:
        """Reference cli/model.py:292-326 semantics."""
        # incremental flow assumes body mel starts exactly at the prompt mel's
        # end (the 24 kHz frontend forces feat == 2*tokens); odd prompts (vc
        # edge cases) fall back to the recompute path. Short prefixes stay on
        # the recompute path (cheaper per chunk, see flow_incr_min_tok); once
        # a session crosses the threshold the first incremental call consumes
        # the whole prefix as one catch-up chunk and the session stays
        # incremental (flow_state is not None) from then on.
        incr = (
            self.incremental_flow
            and prompt_feat.shape[1] == len(prompt_token) * self.token_mel_ratio
            and len(prompt_token) + len(tokens) + 16 <= self.flow_arena_max
            and (
                state.flow_state is not None
                or len(prompt_token) + len(tokens) >= self.flow_incr_min_tok
            )
        )
        if stream and not finalize and self.fused_stream:
            this_hop = len(tokens) - token_offset - self.pre_lookahead_len
            if this_hop <= 0 and state.hift_mel_cache is None:
                return np.zeros((1, 0), np.float32)
            if incr:
                return self._stream_chunk_incr(
                    state, tokens, prompt_token, prompt_feat, embedding, token_offset, this_hop
                )
            return self._stream_chunk_fused(
                state, tokens, prompt_token, prompt_feat, embedding, token_offset, this_hop
            )
        if stream and finalize and incr and speed == 1.0 and state.flow_state is not None:
            return self._finalize_incr(state, tokens, prompt_token, prompt_feat, embedding, token_offset)
        if (
            stream and finalize and speed == 1.0 and self.fused_stream
            and len(tokens) - token_offset > 0
            and not getattr(self, "_disable_fused_final", False)
        ):
            return self._finalize_fused(
                state, tokens, prompt_token, prompt_feat, embedding, token_offset
            )
        all_tokens = np.concatenate([prompt_token, tokens])
        mel = self._flow_chunk(all_tokens, prompt_feat, embedding, streaming=stream, finalize=finalize)
        mel = mel[:, prompt_feat.shape[1] + token_offset * self.token_mel_ratio :]
        if mel.shape[1] == 0 and state.hift_mel_cache is None:
            return np.zeros((1, 0), np.float32)

        if state.hift_mel_cache is not None:
            mel = np.concatenate([state.hift_mel_cache, mel], axis=1)
            cache_source = state.hift_source_cache
        else:
            cache_source = np.zeros((1, 0), np.float32)

        rng = self._seed_key()
        if not finalize:
            wav, src = self._vocode(mel, cache_source, rng)
            if state.hift_speech_cache is not None:
                wav = self._fade(wav, state.hift_speech_cache)
            state.hift_mel_cache = mel[:, -self.mel_cache_len :]
            state.hift_source_cache = src[:, -self.source_cache_len :]
            state.hift_speech_cache = wav[:, -self.source_cache_len :]
            return wav[:, : -self.source_cache_len]
        else:
            if speed != 1.0:
                assert state.hift_mel_cache is None, "speed change only supports non-stream mode"
                from cosyvoice_tpu.ops.resample import interpolate_linear

                mel = np.asarray(
                    interpolate_linear(jnp.asarray(mel.transpose(0, 2, 1)), int(mel.shape[1] / speed))
                ).transpose(0, 2, 1)
            wav, _ = self._vocode(mel, cache_source, rng)
            if state.hift_speech_cache is not None:
                wav = self._fade(wav, state.hift_speech_cache)
            return wav

    def _fade(self, wav: np.ndarray, prev_tail: np.ndarray) -> np.ndarray:
        n = self.source_cache_len
        w = self.speech_window
        out = wav.copy()
        out[:, :n] = wav[:, :n] * w[n:] + prev_tail * w[:n]
        return out

    def next_hop(
        self,
        hop: int,
        chunk_index: int,
        elapsed_s: float,
        token_offset: int,
        n_pending: int,
    ) -> int:
        """Token hop length for the chunk AFTER emitting chunk `chunk_index`.

        Policies (reference Triton consumer,
        runtime/triton_trtllm/model_repo/cosyvoice2/1/model.py:386-429, plus
        the in-repo default cli/model.py:360):
          - 'doubling' (default): hop *= stream_scale_factor, capped at
            token_max_hop_len — the cli engine's fixed 25->50->100 schedule.
          - 'exponential': base * 2**chunk_index, uncapped (model.py:408-409).
          - 'time_based': latency-adaptive (model.py:410-427) — compare the
            audio-duration headroom (emitted audio seconds minus elapsed wall
            seconds) against the average chunk processing time; with > 4
            chunks of headroom consume the whole pending buffer rounded UP to
            a hop multiple, with > 2 rounded down, else fall back to the base
            hop. A slow token2wav stage therefore grows hops faster (each
            chunk amortizes the per-chunk overhead over more tokens), while a
            fast one keeps chunks small for low jitter.
        """
        base = self.token_hop_len
        if self.hop_policy == "exponential":
            return base * (2 ** chunk_index)
        if self.hop_policy == "time_based":
            if chunk_index <= 0 or elapsed_s <= 0:
                return base
            duration_s = token_offset / float(self.token_rate)
            avg_chunk_s = elapsed_s / (chunk_index + 1)
            if avg_chunk_s <= 0:
                return base
            multiples = (duration_s - elapsed_s) / avg_chunk_s
            if multiples > 4:
                nxt = (n_pending // base + 1) * base
            elif multiples > 2:
                nxt = (n_pending // base) * base
            else:
                nxt = base
            return max(base, nxt)
        return min(self.token_max_hop_len, hop * self.stream_scale_factor)

    # ------------------------------------------------------------------
    def tts(
        self,
        text_tokens: np.ndarray,  # [Lt] tts text tokens (Qwen ids)
        prompt_text_tokens: np.ndarray,  # [Lpt]
        llm_prompt_speech_token: np.ndarray,  # [Lps]
        flow_prompt_speech_token: np.ndarray,  # [Lps]
        prompt_speech_feat: np.ndarray,  # [1, Lp_mel, 80]
        flow_embedding: np.ndarray,  # [1, 192]
        stream: bool = False,
        speed: float = 1.0,
        source_speech_token: Optional[np.ndarray] = None,  # vc mode
        rng_seed: Optional[int] = None,
        token_generator=None,  # external LM token stream (e.g. LMBatchScheduler handle)
    ) -> Generator[dict, None, None]:
        """Yields {'tts_speech': np.ndarray [1, n]} chunks."""
        c = self.lm.cfg
        # codec-vocab mismatch guard: out-of-range ids silently corrupt the
        # embedding gathers downstream (NaN audio), so fail loudly instead.
        # (RemoteEngine has no local flow — its token2wav worker re-checks.)
        flow_cfg = getattr(getattr(self, "flow", None), "cfg", None)
        flow_vocab = flow_cfg.vocab_size if flow_cfg is not None else c.speech_token_size
        for name, arr, vocab in (
            ("llm_prompt_speech_token", llm_prompt_speech_token, c.speech_token_size),
            ("flow_prompt_speech_token", flow_prompt_speech_token, flow_vocab),
            ("source_speech_token", source_speech_token, flow_vocab),
        ):
            if arr is not None and np.asarray(arr).size and int(np.max(arr)) >= vocab:
                raise ValueError(
                    f"{name} has id {int(np.max(arr))} >= codec vocab {vocab}: the model config "
                    "does not match the speech tokenizer that produced these tokens"
                )
        state = SessionState()
        la = self.pre_lookahead_len

        if token_generator is not None:
            # continuous-batching serving: the LM runs in a shared
            # LMBatchScheduler; this session only does token->wav
            token_gen = self._squelch(iter(token_generator))
        elif source_speech_token is not None:
            token_gen = iter([np.asarray(source_speech_token, np.int32)])
        elif hasattr(text_tokens, "__next__"):
            # bi-streaming text input (reference cli/model.py:104-111)
            rng = self._seed_key(rng_seed)
            token_gen = self._squelch(
                self.lm.generate_bistream(
                    self.lm_params,
                    text_tokens,
                    prompt_text_tokens.astype(np.int32),
                    llm_prompt_speech_token.astype(np.int32),
                    rng,
                )
            )
        else:
            # LM prompt: [sos, prompt_text, text, task, prompt_speech]
            text = np.concatenate([prompt_text_tokens, text_tokens]).astype(np.int32)
            ids = np.concatenate(
                [[c.sos_id], text, [c.task_id], llm_prompt_speech_token.astype(np.int32)]
            ).astype(np.int32)
            types = np.concatenate(
                [
                    [TYPE_SPECIAL],
                    np.full(len(text), TYPE_TEXT),
                    [TYPE_SPECIAL],
                    np.full(len(llm_prompt_speech_token), TYPE_SPEECH),
                ]
            ).astype(np.int32)
            min_len = int(len(text_tokens) * 2)
            max_len = int(len(text_tokens) * 20)
            if self.scheduler is not None:
                # continuous batching: the shared scheduler decodes this
                # prompt alongside other live sessions in one device program
                token_gen = self._squelch(self.scheduler.submit(ids, types, min_len, max_len))
            else:
                rng = self._seed_key(rng_seed)
                token_gen = self._squelch(self.lm.generate(self.lm_params, ids, types, rng, min_len, max_len))

        produced: list = []

        if not stream:
            for block in token_gen:
                produced.extend(block.tolist())
            wav = self.synthesize_offline(
                np.asarray(produced, np.int32),
                flow_prompt_speech_token.astype(np.int32),
                prompt_speech_feat,
                flow_embedding,
                speed=speed,
            )
            yield {"tts_speech": wav}
            return

        # ---- streaming ----
        t_req = time.perf_counter()
        first_emitted = False
        token_offset = 0
        chunk_index = 0
        hop = self.token_hop_len
        prompt_pad = int(np.ceil(len(flow_prompt_speech_token) / hop) * hop - len(flow_prompt_speech_token))
        gen_done = False

        # speculative fused first chunk: only on the plain-prompt path where
        # this engine owns the LM (the fused program replays generate()'s
        # prefill + first blocks with the identical key schedule)
        fast_ok = (
            self.speculative_first_chunk
            and self.incremental_flow
            and token_generator is None
            and source_speech_token is None
            and self.scheduler is None
            and not hasattr(text_tokens, "__next__")
            and prompt_speech_feat.shape[1] == len(flow_prompt_speech_token) * self.token_mel_ratio
            and speed == 1.0
        )
        if fast_ok:
            fast = self._try_first_chunk_fast(
                state, ids, types, min_len, max_len,
                flow_prompt_speech_token.astype(np.int32), prompt_speech_feat,
                flow_embedding, self._seed_key(rng_seed),
            )
            if fast is not None:
                produced = fast["produced"]
                gen_done = fast["gen_done"]
                if fast["wav"] is not None:
                    token_offset = fast["token_offset"]
                    hop = self.next_hop(
                        hop, 0, elapsed_s=time.perf_counter() - t_req,
                        token_offset=token_offset, n_pending=len(produced) - token_offset,
                    )
                    chunk_index = 1
                    prompt_pad = 0  # consumed by the first chunk
                    if fast["wav"].size:
                        self.timer.add("first_chunk", time.perf_counter() - t_req)
                        first_emitted = True
                    yield {"tts_speech": fast["wav"]}
                # on speculation failure (wav None) gen_done is True and the
                # loop below re-renders everything through the standard path
                token_gen = fast.get("token_gen") or iter(())

        token_gen = _Prefetcher(token_gen)
        while True:
            this_hop = hop + prompt_pad if token_offset == 0 else hop
            # pull LM blocks until we can emit the next chunk (or LM ends)
            while not gen_done and len(produced) - token_offset < this_hop + la:
                try:
                    produced.extend(next(token_gen).tolist())
                except StopIteration:
                    gen_done = True
            if len(produced) - token_offset >= this_hop + la:
                chunk_tokens = np.asarray(produced[: token_offset + this_hop + la], np.int32)
                wav = self.token2wav(
                    state,
                    chunk_tokens,
                    flow_prompt_speech_token.astype(np.int32),
                    prompt_speech_feat,
                    flow_embedding,
                    token_offset=token_offset,
                    stream=True,
                    finalize=False,
                )
                token_offset += this_hop
                # include blocks the LM already finished but the consumer
                # hasn't pulled, so the adaptive policies see the true backlog
                for blk in token_gen.drain_nowait():
                    produced.extend(blk.tolist())
                hop = self.next_hop(
                    hop,
                    chunk_index,
                    elapsed_s=time.perf_counter() - t_req,
                    token_offset=token_offset,
                    n_pending=len(produced) - token_offset,
                )
                chunk_index += 1
                if not first_emitted and wav.size:
                    # engine-side first-chunk latency (excludes frontend/HTTP);
                    # exposed at /metrics for non-tunnel accounting
                    self.timer.add("first_chunk", time.perf_counter() - t_req)
                    first_emitted = True
                yield {"tts_speech": wav}
            if gen_done and len(produced) - token_offset < this_hop + la:
                break
        wav = self.token2wav(
            state,
            np.asarray(produced, np.int32),
            flow_prompt_speech_token.astype(np.int32),
            prompt_speech_feat,
            flow_embedding,
            token_offset=token_offset,
            stream=True,
            finalize=True,
        )
        yield {"tts_speech": wav}

    # ------------------------------------------------------------------
    # silent-token squelch (cli/model.py:101-129): drop runs of more than
    # max_silent consecutive silent/breath tokens. v1/v2 have no silent list.
    silent_tokens: tuple = ()
    max_silent: int = 5

    def _squelch(self, gen):
        if not self.silent_tokens:
            yield from gen
            return
        run = 0
        for block in gen:
            out = []
            for t in block.tolist():
                if t in self.silent_tokens:
                    run += 1
                    if run > self.max_silent:
                        continue
                else:
                    run = 0
                out.append(t)
            if out:
                yield np.asarray(out, np.int32)


class CosyVoice3Engine(CosyVoice2Engine):
    """v3 engine (cli/model.py:397-450): same chunk schedule as v2 but the
    pure-causal vocoder re-vocodes the CUMULATIVE mel each chunk with a
    finalize flag and slices new samples at speech_offset — no source/speech
    caches, no cross-fade. FSQ silent/breath tokens are squelched."""

    silent_tokens = (1, 2, 28, 29, 55, 248, 494, 2241, 2242, 2322, 2323)

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # the fused speculative first chunk assumes the v2 vocoder-cache
        # scheme; v3's cumulative causal re-vocode keeps the standard path
        self.speculative_first_chunk = False
        self._jit_hift_causal = jax.jit(
            lambda p, mel, rng, finalize: self.hift.apply(p, mel, rng, finalize=finalize, method="inference"),
            static_argnames=("finalize",),
        )

    def token2wav(
        self,
        state: SessionState,
        tokens: np.ndarray,
        prompt_token: np.ndarray,
        prompt_feat: np.ndarray,
        embedding: np.ndarray,
        token_offset: int,
        stream: bool = False,
        finalize: bool = False,
        speed: float = 1.0,
    ) -> np.ndarray:
        all_tokens = np.concatenate([prompt_token, tokens])
        r = self.token_mel_ratio
        # incremental flow (v3: DiT estimator KV arenas carried per chunk);
        # the CUMULATIVE causal re-vocode below is kept as-is — it is the
        # reference's streaming-consistency mechanism and the vocoder is a
        # small constant next to the 22-block DiT x 10 Euler steps
        incr = (
            self.incremental_flow and stream
            and prompt_feat.shape[1] == len(prompt_token) * r
            and len(all_tokens) + 16 <= self.flow_arena_max
            and (
                state.flow_state is not None
                or len(all_tokens) >= self.flow_incr_min_tok
            )
        )
        if incr:
            la = self.pre_lookahead_len
            if finalize:
                body, ctx = all_tokens, None
            else:
                body, ctx = all_tokens[:-la], jnp.asarray(all_tokens[None, -la:].astype(np.int32))
            prev = state.flow_pos
            mel_new = self._flow_mel_incr(state, body.astype(np.int32), ctx, prompt_feat, embedding)
            start = max(prompt_feat.shape[1] + token_offset * r - prev * r, 0)
            mel = mel_new[:, start:]
        else:
            mel = self._flow_chunk(all_tokens, prompt_feat, embedding, streaming=stream, finalize=finalize)
            mel = mel[:, prompt_feat.shape[1] + token_offset * self.token_mel_ratio :]

        if state.mel_cumulative is not None:
            mel = np.concatenate([state.mel_cumulative, mel], axis=1)
        state.mel_cumulative = mel
        if speed != 1.0:
            assert token_offset == 0 and finalize, "speed change only supports non-stream mode"
            from cosyvoice_tpu.ops.resample import interpolate_linear

            mel = np.asarray(
                interpolate_linear(jnp.asarray(mel.transpose(0, 2, 1)), int(mel.shape[1] / speed))
            ).transpose(0, 2, 1)
        if mel.shape[1] == 0:
            return np.zeros((1, 0), np.float32)
        rng = self._seed_key()
        if not finalize:
            # bucket the cumulative mel so the re-vocode compiles one program
            # per mel_bucket instead of one per exact chunk-boundary length.
            # Tail-padding with log-silence is exact here: the causal
            # vocoder's emitted (non-lookahead) samples are prefix-stable
            # under suffix extension (the invariant the cumulative-slicing
            # scheme itself depends on, golden-tested in test_hift), and the
            # valid output length shifts linearly with the pad.
            T = mel.shape[1]
            Tb = _bucket_geo(T, self.mel_bucket, self.relative_bucket)
            mel_p = np.full((1, Tb, 80), LOG_SILENCE, np.float32)
            mel_p[:, :T] = mel
            wav, _ = self._jit_hift_causal(self.hift_params, jnp.asarray(mel_p), rng, False)
            wav = np.asarray(wav)[:, : max(0, wav.shape[1] - (Tb - T) * self.wav_hop)]
        else:
            wav, _ = self._jit_hift_causal(self.hift_params, jnp.asarray(mel), rng, True)
            wav = np.asarray(wav)
        wav = wav[:, state.speech_offset :]
        state.speech_offset += wav.shape[1]
        return wav


@dataclass
class V1SessionState:
    """v1 streaming caches (cli/model.py:57-63)."""

    mel_overlap: Optional[np.ndarray] = None  # [1, 34, 80]
    flow_cache: Optional[tuple] = None  # (z, mu) each [1, mel_prompt+34, 80]
    hift_mel_cache: Optional[np.ndarray] = None  # [1, 20, 80]
    hift_source_cache: Optional[np.ndarray] = None
    hift_speech_cache: Optional[np.ndarray] = None
    chunk_idx: int = 0


class CosyVoiceV1Engine:
    """CosyVoice-300M engine (cli/model.py:29-242): growing-hop consumer with
    20-token overlap, mel hamming cross-fade, flow z/mu cache, HiFT
    mel/source caches. Unlike v2, the flow consumes token WINDOWS (not the
    full prefix); continuity comes from the pinned (z, mu) cache."""

    _seed_key = CosyVoice2Engine._seed_key

    def __init__(self, lm, flow, hift, lm_params, flow_params, hift_params, seed: int = 1986):
        self.lm = lm
        self.flow = flow
        self.hift = hift
        self.lm_params = lm_params
        self.flow_params = flow_params
        self.hift_params = hift_params
        self.seed = seed
        self._rng0 = None
        self.timer = StageTimer()
        fr = flow.cfg.input_frame_rate
        self.token_min_hop_len = 2 * fr
        self.token_max_hop_len = 4 * fr
        self.stream_scale_factor = 2  # hop growth per chunk (cli/model.py:50,209)
        self.token_overlap_len = flow.cfg.token_overlap_len
        self.mel_overlap_len = flow.cfg.overlap_mel
        self.mel_window = np.hamming(2 * self.mel_overlap_len)
        self.wav_hop = hift.cfg.hop_total  # 256 @22.05k
        self.mel_cache_len = 20
        self.source_cache_len = self.mel_cache_len * self.wav_hop
        self.speech_window = np.hamming(2 * self.source_cache_len)

        self._jit_flow = jax.jit(self.flow.inference, static_argnames=("prompt_token_len",))
        self._jit_hift = jax.jit(
            lambda p, mel, rng, cache_source: self.hift.apply(
                p, mel, rng, cache_source=cache_source, method="inference"
            )
        )

    # ------------------------------------------------------------------
    def token2wav(self, state, tokens, prompt_token, prompt_feat, embedding, finalize=False, speed=1.0):
        """tokens: [Lw] current window (hop+overlap, or remainder)."""
        if len(tokens) == 0:
            # finalize with no fresh tokens: emit the held-back overlap mel
            mel = state.mel_overlap if state.mel_overlap is not None else np.zeros((1, 0, 80), np.float32)
            state.mel_overlap = None
            if mel.shape[1] == 0 and state.hift_mel_cache is None:
                return np.zeros((1, 0), np.float32)
        else:
            all_tok = np.concatenate([prompt_token, tokens]).astype(np.int32)
            rng = jax.random.fold_in(self._seed_key(), state.chunk_idx)
            mel, new_cache = self._jit_flow(
                self.flow_params,
                rng,
                jnp.asarray(all_tok[None]),
                len(prompt_token),
                jnp.asarray(prompt_feat),
                jnp.asarray(embedding),
                cache=state.flow_cache,
            )
            state.flow_cache = new_cache
            state.chunk_idx += 1
            mel = np.asarray(mel)

            if state.mel_overlap is not None:
                n = min(self.mel_overlap_len, mel.shape[1])
                w_in = self.mel_window[: self.mel_overlap_len]
                w_out = self.mel_window[self.mel_overlap_len :]
                head = mel[:, :n] * w_in[None, :n, None] + state.mel_overlap[:, :n] * w_out[None, :n, None]
                mel = np.concatenate([head, mel[:, n:]], axis=1)
        if state.hift_mel_cache is not None:
            mel = np.concatenate([state.hift_mel_cache, mel], axis=1)
            cache_source = state.hift_source_cache
        else:
            cache_source = np.zeros((1, 0), np.float32)

        hift_rng = self._seed_key()
        if not finalize:
            state.mel_overlap = mel[:, -self.mel_overlap_len :]
            mel = mel[:, : -self.mel_overlap_len]
            wav, src = self._vocode(mel, cache_source, hift_rng)
            if state.hift_speech_cache is not None:
                wav = self._fade_speech(wav, state.hift_speech_cache)
            state.hift_mel_cache = mel[:, -self.mel_cache_len :]
            state.hift_source_cache = src[:, -self.source_cache_len :]
            state.hift_speech_cache = wav[:, -self.source_cache_len :]
            return wav[:, : -self.source_cache_len]
        else:
            if speed != 1.0:
                assert state.hift_mel_cache is None, "speed change only supports non-stream mode"
                from cosyvoice_tpu.ops.resample import interpolate_linear

                mel = np.asarray(
                    interpolate_linear(jnp.asarray(mel.transpose(0, 2, 1)), int(mel.shape[1] / speed))
                ).transpose(0, 2, 1)
            wav, _ = self._vocode(mel, cache_source, hift_rng)
            if state.hift_speech_cache is not None:
                wav = self._fade_speech(wav, state.hift_speech_cache)
            return wav

    def _vocode(self, mel, cache_source, rng):
        wav, src = self._jit_hift(self.hift_params, jnp.asarray(mel), rng, jnp.asarray(cache_source))
        return np.asarray(wav), np.asarray(src)

    def _fade_speech(self, wav, prev_tail):
        n = self.source_cache_len
        w = self.speech_window
        out = wav.copy()
        out[:, :n] = wav[:, :n] * w[n:] + prev_tail * w[:n]
        return out

    # ------------------------------------------------------------------
    def tts(
        self,
        text_tokens,
        prompt_text_tokens,
        llm_prompt_speech_token,
        flow_prompt_speech_token,
        prompt_speech_feat,
        flow_embedding,
        llm_embedding=None,
        stream=False,
        speed=1.0,
        source_speech_token=None,
        rng_seed=None,
    ):
        for name, arr, vocab in (
            ("llm_prompt_speech_token", llm_prompt_speech_token, self.lm.cfg.speech_token_size),
            ("flow_prompt_speech_token", flow_prompt_speech_token, self.flow.cfg.vocab_size),
            ("source_speech_token", source_speech_token, self.flow.cfg.vocab_size),
        ):
            if arr is not None and np.asarray(arr).size and int(np.max(arr)) >= vocab:
                raise ValueError(
                    f"{name} has id {int(np.max(arr))} >= codec vocab {vocab}: the model config "
                    "does not match the speech tokenizer that produced these tokens"
                )
        state = V1SessionState()
        if source_speech_token is None:
            text = np.concatenate([prompt_text_tokens, text_tokens]).astype(np.int32)
            min_len = int(len(text_tokens) * 2)
            max_len = int(len(text_tokens) * 20)
            emb = llm_embedding if llm_embedding is not None else flow_embedding
            rng = self._seed_key(rng_seed)
            token_gen = self.lm.generate(
                self.lm_params, text, emb, llm_prompt_speech_token.astype(np.int32), rng, min_len, max_len
            )
        else:
            token_gen = iter([np.asarray(source_speech_token, np.int32)])

        pending: list = []
        if not stream:
            for block in token_gen:
                pending.extend(block.tolist())
            wav = self.token2wav(
                state, np.asarray(pending, np.int32), flow_prompt_speech_token.astype(np.int32),
                prompt_speech_feat, flow_embedding, finalize=True, speed=speed,
            )
            yield {"tts_speech": wav}
            return

        token_gen = _Prefetcher(token_gen)
        t_req = time.perf_counter()
        first_emitted = False
        hop = self.token_min_hop_len
        gen_done = False
        while True:
            while not gen_done and len(pending) < hop + self.token_overlap_len:
                try:
                    pending.extend(next(token_gen).tolist())
                except StopIteration:
                    gen_done = True
            if len(pending) >= hop + self.token_overlap_len:
                window = np.asarray(pending[: hop + self.token_overlap_len], np.int32)
                wav = self.token2wav(
                    state, window, flow_prompt_speech_token.astype(np.int32),
                    prompt_speech_feat, flow_embedding, finalize=False,
                )
                pending = pending[hop:]
                # growing hop (reference cli/model.py:209): small first chunks
                # for latency, larger later chunks for throughput
                hop = min(self.token_max_hop_len, int(hop * self.stream_scale_factor))
                if not first_emitted and wav.size:
                    self.timer.add("first_chunk", time.perf_counter() - t_req)
                    first_emitted = True
                yield {"tts_speech": wav}
            if gen_done and len(pending) < hop + self.token_overlap_len:
                break
        wav = self.token2wav(
            state, np.asarray(pending, np.int32), flow_prompt_speech_token.astype(np.int32),
            prompt_speech_feat, flow_embedding, finalize=True,
        )
        yield {"tts_speech": wav}
