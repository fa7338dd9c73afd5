"""On-device token sampling: nucleus + Repetition-Aware Sampling (RAS).

Vectorized re-derivation of the reference's Python sampling loop
(cosyvoice/utils/common.py:138-167): nucleus top-p/top-k with *inclusive*
p-crossing element, then VALL-E-2 RAS — if the sampled id already occurred
>= win_size*tau_r times in the last win_size decoded tokens, resample from the
full softmax with that id banned. Runs fully inside jit so the LM decode scan
never leaves the device.
"""

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


@partial(jax.jit, static_argnames=("top_k",))
def nucleus_sampling(rng: jax.Array, logp: jax.Array, top_p: float = 0.8, top_k: int = 25) -> jax.Array:
    """Sample from the top-p/top-k head of softmax(logp). logp: [V] log-probs.

    Keep rule mirrors the reference loop: element i (prob-desc order) is kept
    iff exclusive-cumsum(prob)[i] < top_p AND i < top_k, i.e. the element that
    crosses top_p is included.

    Since top_k <= 25 << V, only a lax.top_k over V is needed (not a full
    sort) — the decode hot loop then works on 25 elements.
    """
    probs = jax.nn.softmax(logp)
    top_probs, top_idx = jax.lax.top_k(probs, min(top_k, logp.shape[0]))
    excl_cum = jnp.cumsum(top_probs) - top_probs
    keep = (excl_cum < top_p) & (jnp.arange(top_probs.shape[0]) < top_k)
    masked_logits = jnp.where(keep, jnp.log(jnp.maximum(top_probs, 1e-30)), NEG_INF)
    pick = jax.random.categorical(rng, masked_logits)
    return top_idx[pick]


def apply_repetition_penalty(logits: jax.Array, seen: jax.Array, penalty: float) -> jax.Array:
    """CTRL/TRT-LLM-convention repetition penalty (reference serving config:
    runtime/triton_trtllm/model_repo/cosyvoice2/1/model.py:116-126 passes
    repetition_penalty=1.1 to TRT-LLM): for every vocab id marked in `seen`,
    positive logits are divided by `penalty`, negative multiplied.

    logits: [..., V]; seen: [..., V] bool (ids present in the sequence so
    far — prompt speech tokens + generated tokens)."""
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, pen, logits)


def ras_sampling(
    rng: jax.Array,
    logp: jax.Array,
    recent_tokens: jax.Array,
    recent_len: jax.Array,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
) -> jax.Array:
    """Repetition-aware sampling.

    Args:
      logp: [V] log-probs (eos already masked by caller when ignore_eos).
      recent_tokens: [win_size] int32 ring of the last decoded tokens
        (pad with -1 when fewer than win_size decoded).
      recent_len: scalar count of valid entries in recent_tokens.

    Returns: scalar int32 token id.
    """
    rng1, rng2 = jax.random.split(rng)
    cand = nucleus_sampling(rng1, logp, top_p=top_p, top_k=top_k)
    # ring fills shift-left/append-right: the recent_len REAL tokens occupy
    # the RIGHT end, -1 padding the left
    n = recent_tokens.shape[0]
    valid = jnp.arange(n) >= n - recent_len
    rep = jnp.sum((recent_tokens == cand) & valid)
    resampled = jax.random.categorical(rng2, jnp.where(jnp.arange(logp.shape[0]) == cand, NEG_INF, logp))
    return jnp.where(rep >= win_size * tau_r, resampled, cand).astype(jnp.int32)


def ras_sampling_batch(
    rng: jax.Array,
    logp: jax.Array,
    recent_tokens: jax.Array,
    recent_len: jax.Array,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
) -> jax.Array:
    """Batched RAS: one vmapped sampler subgraph for all rows.

    Per-row keys are fold_in(rng, b) — bit-identical to the former per-row
    Python loop, so decode streams are unchanged; this only collapses B
    traced sampler copies (B serialized dispatch regions at trace time)
    into a single vmap body.

    Args: logp [B, V]; recent_tokens [B, win_size]; recent_len [B].
    Returns: [B] int32 token ids.
    """
    keys = jax.vmap(lambda b: jax.random.fold_in(rng, b))(jnp.arange(logp.shape[0], dtype=jnp.uint32))
    return jax.vmap(
        lambda k, lp, rec, rl: ras_sampling(
            k, lp, rec, rl, top_p=top_p, top_k=top_k, win_size=win_size, tau_r=tau_r
        )
    )(keys, logp, recent_tokens, recent_len)
