"""Continuous batching for the speech-token LM (the vLLM role in the
reference serving stack, runtime/triton_trtllm + vllm_example.py).

TPU-native design: ONE persistent batched KV arena [L, B, max_cache, H, D]
lives on device; every decode block is a single fixed-shape XLA program over
all B slots (`Qwen2LM._decode_block_impl` is batch-general). Sessions join by
prefilling into a size-1 cache and splicing it into their slot with
`dynamic_update_slice` — no recompile, no padding waste, no host copies of
the arena. Finished rows keep sampling eos into a dead slot until reused
(fixed shapes beat ragged batching on TPU).

Unlike vLLM's paged allocator, the arena is dense per slot: CosyVoice
sequences are short (<= a few thousand positions), so slot_len == max_cache
costs less than page-table indirection would.

Sampling note: like any continuously-batched server, the per-request RNG
stream depends on slot placement, so outputs for a given seed differ from
the single-session path (they are deterministic for a fixed submission
order)."""

import queue
import threading
from dataclasses import dataclass, field
from typing import Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.llm import Qwen2LM, TYPE_SPEECH


def _insert_cache_slot(batch_cache, slot_cache, b):
    """Splice a [L, 1, ...] prefilled cache into slot b of [L, B, ...].
    Generic over the cache pytree: (k, v) bf16 arenas or the int8-KV
    4-tuple (k_q, v_q, k_scale, v_scale) with [L, B, T] scale planes."""
    return tuple(
        jax.lax.dynamic_update_slice(dst, src.astype(dst.dtype), (0, b) + (0,) * (dst.ndim - 2))
        for dst, src in zip(batch_cache, slot_cache)
    )


@dataclass
class _Session:
    handle: "SessionHandle"
    min_len: int
    max_len: int
    produced: int = 0
    done: bool = False


class SessionHandle:
    """Iterator of np token blocks for one submitted prompt."""

    def __init__(self):
        self._q: "queue.Queue" = queue.Queue()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise RuntimeError("batch scheduler failed while serving this session") from item
            yield item

    def _push(self, toks: np.ndarray):
        if len(toks):
            self._q.put(toks)

    def _close(self):
        self._q.put(None)

    def _fail(self, exc: BaseException):
        self._q.put(exc)


class LMBatchScheduler:
    """Continuous-batching decode loop over a fixed number of slots.

    submit() is thread-safe and returns a SessionHandle immediately; a
    background loop admits pending prompts into free slots (prefill + arena
    splice) and decodes one block per iteration for ALL active slots in one
    device call. run with `start()`/`stop()`, or drive synchronously with
    `step()` for tests."""

    def __init__(self, lm: Qwen2LM, params, max_batch: int = 4,
                 block_size: Optional[int] = None, seed: int = 1986,
                 prompt_bucket: int = 128):
        self.lm = lm
        self.params = params
        self.B = max_batch
        self.block_size = block_size or lm.cfg.block_size
        self.prompt_bucket = prompt_bucket
        c = lm.cfg

        # the arena starts at one bucket and grows with the live max length;
        # decode-attention HBM reads scale with the arena, so a small arena
        # doubles batched-decode throughput vs preallocating max_cache_len
        self.cache = lm.init_cache(max_batch, length=lm.arena_bucket(self.block_size + 1))
        self._cur_host = np.zeros((max_batch,), np.int64)  # worst-case write positions
        self.cur_len = jnp.zeros((max_batch,), jnp.int32)
        self.logits = jnp.zeros((max_batch, c.head_size), jnp.float32)
        self.recent = jnp.full((max_batch, c.win_size), -1, jnp.int32)
        self.n_decoded = jnp.zeros((max_batch,), jnp.int32)
        self.min_len = jnp.zeros((max_batch,), jnp.int32)
        self.finished = jnp.ones((max_batch,), bool)  # empty slots are "finished"
        # repetition-penalty presence sets (only materialized when the knob
        # is on: [B, head_size] bool adds ~26 KB/slot)
        self.seen = (
            jnp.zeros((max_batch, c.head_size), bool) if c.repetition_penalty != 1.0 else None
        )

        self.slots: List[Optional[_Session]] = [None] * max_batch
        self.pending: "queue.Queue" = queue.Queue()
        self._parked = None  # oldest pending item held out of the queue (keeps FIFO)
        self.rng = jax.random.PRNGKey(seed)
        self._keys = None  # batched key schedule: one device call per 256 blocks
        self._key_i = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

        self._jit_insert = jax.jit(_insert_cache_slot, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def submit(self, prompt_ids: np.ndarray, prompt_types: np.ndarray,
               min_len: int, max_len: int) -> SessionHandle:
        h = SessionHandle()
        self.pending.put((np.asarray(prompt_ids, np.int32),
                          np.asarray(prompt_types, np.int32),
                          _Session(h, int(min_len), int(max_len))))
        return h

    @property
    def n_active(self) -> int:
        return sum(s is not None for s in self.slots)

    # ------------------------------------------------------------------
    def _admit(self, b: int, prompt_ids, prompt_types, sess: _Session):
        T = len(prompt_ids)
        bucket = self.prompt_bucket
        pad_T = ((T + bucket - 1) // bucket) * bucket
        ids = np.zeros((1, pad_T), np.int32)
        types = np.full((1, pad_T), TYPE_SPEECH, np.int32)
        ids[0, :T] = prompt_ids
        types[0, :T] = prompt_types
        slot_cache = self.lm.init_cache(1, length=self.lm.arena_bucket(pad_T + 1))
        logits1, slot_cache = self.lm._jit_prefill(
            self.params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray([T]), slot_cache
        )
        if slot_cache[0].shape[2] > self.cache[0].shape[2]:
            self.cache = self.lm.grow_cache(self.cache, slot_cache[0].shape[2])
        self.cache = self._jit_insert(self.cache, slot_cache, b)
        self._cur_host[b] = T
        self.cur_len = self.cur_len.at[b].set(T)
        self.logits = self.logits.at[b].set(logits1[0])
        self.recent = self.recent.at[b].set(-1)
        self.n_decoded = self.n_decoded.at[b].set(0)
        self.min_len = self.min_len.at[b].set(sess.min_len)
        self.finished = self.finished.at[b].set(False)
        if self.seen is not None:
            c = self.lm.cfg
            seen_np = np.zeros((c.head_size,), bool)
            sp = np.asarray(prompt_ids)[np.asarray(prompt_types) == 1]  # TYPE_SPEECH
            seen_np[sp[sp < c.head_size]] = True
            self.seen = self.seen.at[b].set(jnp.asarray(seen_np))
        self.slots[b] = sess

    def _retire(self, b: int):
        sess = self.slots[b]
        if sess is not None:
            sess.handle._close()
        self.slots[b] = None
        self.finished = self.finished.at[b].set(True)

    # ------------------------------------------------------------------
    def step(self) -> bool:
        """Admit pending prompts, then decode one block for all active slots.
        Returns True if any work was done."""
        admitted = False
        for b in range(self.B):
            if self.slots[b] is None:
                if self._parked is not None:
                    item, self._parked = self._parked, None
                else:
                    try:
                        item = self.pending.get_nowait()
                    except queue.Empty:
                        break
                prompt_ids, prompt_types, sess = item
                self._admit(b, prompt_ids, prompt_types, sess)
                admitted = True
        if self.n_active == 0:
            return admitted

        live = np.asarray([self._cur_host[b] for b in range(self.B) if self.slots[b] is not None])
        need = int(live.max()) + self.block_size + 1
        if need > self.cache[0].shape[2]:
            self.cache = self.lm.grow_cache(self.cache, self.lm.arena_bucket(need))
        k = self._next_key()
        out = self.lm._jit_decode_block(
            self.params, k, self.cache, self.cur_len, self.logits, self.recent,
            self.n_decoded, self.min_len, self.finished, self.block_size,
            ragged=True,  # slots hold different sequence lengths
            seen=self.seen,
        )
        (tokens, self.logits, self.cache, self.cur_len, self.recent,
         self.n_decoded, self.finished) = out[:7]
        if self.seen is not None:
            self.seen = out[7]
        # the ONLY host sync per block. Stop state is derived host-side from
        # the tokens themselves (a live slot flips `finished` exactly when a
        # stop id appears in its block) — fetching `finished` too would be a
        # second device round trip per block.
        toks_np = np.asarray(tokens)
        c = self.lm.cfg
        for b in range(self.B):
            sess = self.slots[b]
            if sess is None:
                continue
            self._cur_host[b] += self.block_size
            toks = toks_np[b]
            stop_idx = np.nonzero(toks >= c.speech_token_size)[0]
            stopped = len(stop_idx) > 0
            if stopped:
                toks = toks[: stop_idx[0]]
            toks = toks[: sess.max_len - sess.produced]
            sess.produced += len(toks)
            sess.handle._push(toks)
            if stopped or sess.produced >= sess.max_len:
                self._retire(b)
        return True

    def _next_key(self):
        """Per-block sampler key without a per-block device call: the
        `rng, k = split(rng)` chain is materialized 64 keys at a time (one
        scan on device), bit-identical to a per-block split — a lone session
        in the arena reproduces lm.generate's token stream exactly."""
        if self._keys is None or self._key_i >= 64:
            from cosyvoice_tpu.models.llm import _split_chain

            self.rng, self._keys = _split_chain(self.rng, 64)
            self._key_i = 0
        k = self._keys[self._key_i]
        self._key_i += 1
        return k

    # ------------------------------------------------------------------
    def _loop(self):
        import logging

        while not self._stop.is_set():
            try:
                with self._lock:
                    worked = self.step()
            except Exception as e:  # noqa: BLE001 — a dead loop wedges every consumer
                logging.exception("batch scheduler step failed; failing %d live sessions", self.n_active)
                with self._lock:
                    for b in range(self.B):
                        if self.slots[b] is not None:
                            self.slots[b].handle._fail(e)
                            self.slots[b] = None
                    self.finished = jnp.ones((self.B,), bool)
                continue
            if not worked and self.n_active == 0:
                # idle: hold the next submission out of the queue (a get+put
                # round trip would rotate it behind newer arrivals)
                if self._parked is None:
                    try:
                        self._parked = self.pending.get(timeout=0.05)
                    except queue.Empty:
                        continue

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30.0)
            self._thread = None
        # flush: close all live handles and drain pending submissions
        for b in range(self.B):
            self._retire(b)
        if self._parked is not None:
            self._parked[2].handle._close()
            self._parked = None
        while True:
            try:
                _, _, sess = self.pending.get_nowait()
            except queue.Empty:
                break
            sess.handle._close()
