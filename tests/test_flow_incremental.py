"""Incremental chunked flow == full-prefix streaming recompute.

The engine's streaming path historically re-ran the flow on the whole prefix
every chunk and sliced the new mel (reference cli/model.py:294-303 — O(T^2)).
The incremental path (CausalFlow.inference_chunk) carries KV arenas + conv
caches so each chunk costs O(chunk * prefix). Under chunk-causal masks the
two are mathematically identical on the new rows; these goldens pin that
(pattern of the reference's own chunk-vs-full checks, flow/flow.py:417-443).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig


CHUNK = 4  # tokens per flow chunk


@pytest.fixture(scope="module")
def flow_and_params():
    cfg = FlowConfig(
        input_size=64,
        vocab_size=50,
        chunk_size=CHUNK,
        attention_heads=2,
        linear_units=96,
        num_blocks=2,
        num_up_blocks=1,
        estimator=EstimatorConfig(
            channels=(32,),
            attention_head_dim=8,
            n_blocks=1,
            num_mid_blocks=2,
            num_heads=2,
            static_chunk_size=CHUNK * 2,
            causal=True,
        ),
        cfm=CFMConfig(n_timesteps=3),
    )
    flow = CausalFlow(cfg)
    params = flow.init(jax.random.PRNGKey(0))
    return flow, params


def _full_recompute_chunk(flow, params, tokens, conds_full, emb, k, n_chunks, la=3):
    """Reference semantics: re-run the whole prefix with chunk masks, slice
    the new chunk's mel (the engine's _flow_chunk + slice)."""
    r = flow.cfg.token_mel_ratio
    body_len = (k + 1) * CHUNK
    finalize = k == n_chunks - 1
    if finalize:
        body = tokens[:body_len]
        ctx = None
        Lpad = body_len + la  # slack the encoder requires
    else:
        body = tokens[:body_len]
        ctx = jnp.asarray(tokens[None, body_len : body_len + la])
        Lpad = body_len + la
    tok = np.zeros((1, Lpad), np.int32)
    tok[0, :body_len] = body
    conds = np.zeros((1, Lpad * r, 80), np.float32)
    conds[:, : conds_full.shape[1]] = conds_full[:, : Lpad * r]
    mel = flow.inference(
        params, jnp.asarray(tok), jnp.asarray([body_len]), jnp.asarray(conds),
        emb, context_token=ctx, streaming=True,
    )
    return np.asarray(mel)[:, k * CHUNK * r : body_len * r]


def test_chunked_equals_recompute(flow_and_params):
    flow, params = flow_and_params
    rng = np.random.default_rng(0)
    n_chunks = 4
    total = n_chunks * CHUNK
    tokens = rng.integers(0, 50, total).astype(np.int32)
    emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))
    r = flow.cfg.token_mel_ratio
    conds_full = np.zeros((1, total * r, 80), np.float32)
    conds_full[:, : 2 * r] = rng.standard_normal((1, 2 * r, 80)).astype(np.float32)  # fake prompt mel

    state = flow.stream_state(B=1, arena_tok=32)
    la = 3
    for k in range(n_chunks):
        ref = _full_recompute_chunk(flow, params, tokens, conds_full, emb, k, n_chunks, la)
        chunk_tok = jnp.asarray(tokens[None, k * CHUNK : (k + 1) * CHUNK])
        if k == n_chunks - 1:
            ctx = None
        else:
            ctx = jnp.asarray(tokens[None, (k + 1) * CHUNK : (k + 1) * CHUNK + la])
        conds_chunk = jnp.asarray(conds_full[:, k * CHUNK * r : (k + 1) * CHUNK * r])
        mel, state = flow.inference_chunk(
            params, chunk_tok, ctx, conds_chunk, emb, state,
            jnp.asarray(k * CHUNK), jnp.asarray(CHUNK),
        )
        got = np.asarray(mel)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"chunk {k} diverged from full recompute")


def test_chunked_with_padded_tail(flow_and_params):
    """A chunk padded beyond real_n must produce the same real rows and leave
    the state equivalent (the padded garbage is masked / overwritten)."""
    flow, params = flow_and_params
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 50, 3 * CHUNK).astype(np.int32)
    emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))
    r = flow.cfg.token_mel_ratio
    conds = np.zeros((1, 6 * CHUNK * r, 80), np.float32)
    la = 3

    def run(pad_to):
        state = flow.stream_state(B=1, arena_tok=32)
        mels = []
        for k in range(3):
            n_real = CHUNK
            chunk = np.zeros((1, pad_to), np.int32)
            chunk[0, :n_real] = tokens[k * CHUNK : (k + 1) * CHUNK]
            ctx = (
                jnp.asarray(tokens[None, (k + 1) * CHUNK : (k + 1) * CHUNK + la])
                if k < 2 else None
            )
            cc = np.zeros((1, pad_to * r, 80), np.float32)
            mel, state = flow.inference_chunk(
                params, jnp.asarray(chunk), ctx, jnp.asarray(cc), emb, state,
                jnp.asarray(k * CHUNK), jnp.asarray(n_real),
            )
            mels.append(np.asarray(mel)[:, : n_real * r])
        return np.concatenate(mels, axis=1)

    exact = run(CHUNK)
    padded = run(CHUNK + 3)
    np.testing.assert_allclose(padded, exact, rtol=2e-4, atol=2e-4)


def test_grow_stream_state(flow_and_params):
    """Arena growth mid-stream is value-neutral."""
    flow, params = flow_and_params
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 50, 3 * CHUNK).astype(np.int32)
    emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))
    r = flow.cfg.token_mel_ratio
    la = 3

    def run(grow):
        state = flow.stream_state(B=1, arena_tok=16)
        mels = []
        for k in range(3):
            if grow and k == 2:
                state = flow.grow_stream_state(state, 32)
            chunk = jnp.asarray(tokens[None, k * CHUNK : (k + 1) * CHUNK])
            ctx = (
                jnp.asarray(tokens[None, (k + 1) * CHUNK : (k + 1) * CHUNK + la])
                if k < 2 else None
            )
            cc = jnp.zeros((1, CHUNK * r, 80), jnp.float32)
            mel, state = flow.inference_chunk(
                params, chunk, ctx, cc, emb, state, jnp.asarray(k * CHUNK), jnp.asarray(CHUNK)
            )
            mels.append(np.asarray(mel))
        return np.concatenate(mels, axis=1)

    np.testing.assert_allclose(run(True), run(False), rtol=2e-4, atol=2e-4)
