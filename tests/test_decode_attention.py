"""Pallas flash-decode attention + KV-arena write kernels (interpret mode on
the CPU test mesh; the compiled Mosaic path is exercised on real TPU by
bench.py and the engine when enabled)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice_tpu.ops.decode_attention import (
    gqa_decode_attention,
    gqa_decode_attention_reference,
    kv_arena_write,
)


@pytest.mark.parametrize("lens", [[0], [5, 517, 1023], [1023, 64]])
def test_decode_attention_matches_einsum(lens):
    rng = np.random.default_rng(0)
    B, Hq, Hkv, d, T = len(lens), 14, 2, 64, 1024
    q = jnp.asarray(rng.standard_normal((B, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    cur = jnp.asarray(lens, jnp.int32)
    out = gqa_decode_attention(q, k, v, cur, block_size=256, interpret=True)
    ref = gqa_decode_attention_reference(q, k, v, cur)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_decode_attention_ignores_dead_arena():
    """Positions beyond cur_len must not affect the output (the kernel never
    reads dead blocks; the einsum masks them)."""
    rng = np.random.default_rng(1)
    B, Hq, Hkv, d, T = 2, 14, 2, 64, 512
    q = jnp.asarray(rng.standard_normal((B, Hq, d)), jnp.float32)
    k = rng.standard_normal((B, T, Hkv, d)).astype(np.float32)
    v = rng.standard_normal((B, T, Hkv, d)).astype(np.float32)
    cur = jnp.asarray([100, 300], jnp.int32)
    out1 = gqa_decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), cur,
                                block_size=128, interpret=True)
    k2, v2 = k.copy(), v.copy()
    k2[0, 101:] = 1e6
    v2[1, 301:] = -1e6
    out2 = gqa_decode_attention(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), cur,
                                block_size=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=0, atol=0)


def test_kv_arena_write_rows():
    rng = np.random.default_rng(2)
    B, T, Hkv, d = 3, 64, 2, 64
    arena = rng.standard_normal((B, T, Hkv, d)).astype(np.float32)
    new = rng.standard_normal((B, 1, Hkv, d)).astype(np.float32)
    pos = np.asarray([0, 13, 63], np.int32)
    expect = arena.copy()
    for b in range(B):
        expect[b, pos[b]] = new[b, 0]
    got = kv_arena_write(jnp.asarray(arena), jnp.asarray(new), jnp.asarray(pos), interpret=True)
    np.testing.assert_allclose(np.asarray(got), expect, rtol=0, atol=0)


def test_kv_arena_write_rows_int8():
    """int8 arena uses the 32-sublane tile group; the row write must hit
    exactly arena[b, pos[b]] including rows at group boundaries (31/32) and
    the arena tail (T-1)."""
    rng = np.random.default_rng(3)
    B, T, Hkv, d = 4, 96, 2, 64  # T multiple of 32
    arena = rng.integers(-128, 128, (B, T, Hkv, d)).astype(np.int8)
    new = rng.integers(-128, 128, (B, 1, Hkv, d)).astype(np.int8)
    pos = np.asarray([0, 31, 32, 95], np.int32)
    expect = arena.copy()
    for b in range(B):
        expect[b, pos[b]] = new[b, 0]
    got = kv_arena_write(jnp.asarray(arena), jnp.asarray(new), jnp.asarray(pos), interpret=True)
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_model_ragged_decode_flash_matches_einsum(monkeypatch):
    """decode_step_ragged with the flash kernel wired in (COSY_FLASH_DECODE=
    force -> interpret on CPU) must match the masked-einsum path."""
    from cosyvoice_tpu.models.qwen2 import Qwen2Config, Qwen2Model

    cfg = Qwen2Config(hidden_size=128, num_layers=2, num_heads=4, num_kv_heads=2,
                      head_dim=64, intermediate_size=256, vocab_size=64,
                      max_cache_len=256, dtype=jnp.float32)
    model = Qwen2Model(cfg)
    rng = np.random.default_rng(3)
    B = 3
    emb = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb, jnp.ones((B, 1), bool))
    cache = model.init_cache(B, dtype=jnp.float32, length=256)
    # seed the arena with noise so dead positions would corrupt a bad mask
    cache = jax.tree.map(
        lambda x: jnp.asarray(rng.standard_normal(x.shape), x.dtype), cache)
    cur = jnp.asarray([7, 130, 255], jnp.int32)

    def run():
        # default-precision f32 dots are bf16-grade on this backend, and the
        # kernel/einsum paths reassociate differently — compare at full
        # precision so the tolerance tests the MATH, not the dot rounding
        with jax.default_matmul_precision("highest"):
            return model.apply(params, emb, cur, cache, method="decode_step_ragged")

    monkeypatch.setenv("COSY_FLASH_DECODE", "0")
    h_ref, cache_ref = run()
    monkeypatch.setenv("COSY_FLASH_DECODE", "force")
    h_flash, cache_flash = run()
    np.testing.assert_allclose(np.asarray(h_flash), np.asarray(h_ref), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(cache_flash), jax.tree.leaves(cache_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# int8 KV arena (kv_quant): quantized flash kernel + end-to-end cache path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("lens", [[0], [5, 700, 1023]])
def test_quant_decode_attention_matches_dequant_einsum(lens):
    """The int8 flash kernel's column/weight-folded dequant must equal the
    dequantize-then-attend einsum exactly (same math, different order)."""
    from cosyvoice_tpu.ops.decode_attention import (
        gqa_decode_attention_quant,
        gqa_decode_attention_quant_reference,
        quantize_kv_rows,
    )

    rng = np.random.default_rng(4)
    B, Hq, Hkv, d, T = len(lens), 14, 2, 64, 1024
    q = jnp.asarray(rng.standard_normal((B, Hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, d)), jnp.float32)
    kq, ks = quantize_kv_rows(k)
    vq, vs = quantize_kv_rows(v)
    cur = jnp.asarray(lens, jnp.int32)
    out = gqa_decode_attention_quant(q, kq, vq, ks, vs, cur, block_size=256, interpret=True)
    ref = gqa_decode_attention_quant_reference(q, kq, vq, ks, vs, cur)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-5


def test_quantize_kv_rows_roundtrip_error():
    """Per-token absmax int8: reconstruction error bounded by scale/2."""
    from cosyvoice_tpu.ops.decode_attention import dequantize_kv_arena, quantize_kv_rows

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 2, 64)), jnp.float32)
    q, s = quantize_kv_rows(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 64)
    back = dequantize_kv_arena(q, s, jnp.float32)
    err = jnp.max(jnp.abs(back - x))
    assert float(err) <= float(jnp.max(s)) * 0.5 + 1e-7


def test_lm_generate_kv_quant_matches_fp():
    """The int8 KV arena's decode logits track the fp arena's to far below
    sampling thresholds, teacher-forced over a shared token trail.

    (An earlier version asserted exact sampled-stream equality; on random-init
    weights the logit gaps are near machine epsilon, so the comparison was
    chaotic across hosts — one libm rounding difference flips a token and the
    rest of the stream. Deterministic logit closeness is the actual contract.)
    """
    import dataclasses

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    qwen = Qwen2Config(hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
                       head_dim=16, intermediate_size=128, vocab_size=256,
                       max_cache_len=256, dtype=jnp.float32)
    cfg = LMConfig(speech_token_size=50, qwen=qwen)
    lm = Qwen2LM(cfg)
    params = lm.init(jax.random.PRNGKey(0))
    lmq = Qwen2LM(dataclasses.replace(cfg, qwen=dataclasses.replace(qwen, kv_quant=True)))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50, (1, 17)), jnp.int32)
    types = jnp.ones((1, 17), jnp.int32)
    trail = jnp.asarray(rng.integers(0, 50, (24,)), jnp.int32)

    def teacher_forced_logits(model):
        cache = model.init_cache(1, length=64)
        logits, cache = model.module.apply(
            params, ids, types, jnp.asarray([17]), cache, method="prefill")
        outs = [logits]
        cur = jnp.asarray([17], jnp.int32)
        for t in range(trail.shape[0]):
            logits, cache = model.module.apply(
                params, trail[t][None], cur, cache, method="decode_step")
            outs.append(logits)
            cur = cur + 1
        return np.stack([np.asarray(o).reshape(-1) for o in outs])

    lf = teacher_forced_logits(lm)
    lq = teacher_forced_logits(lmq)
    # fp and int8-KV arenas agree to ~2% of the logit scale (measured
    # 0.0202 on this configuration); the decisive-margin argmax check below
    # is the functional guarantee that matters for sampling
    dev = np.max(np.abs(lf - lq))
    scale = np.max(np.abs(lf))
    assert dev < 0.03 * scale, (dev, scale)
    # and top-1 agrees wherever fp's top-2 margin exceeds twice the deviation
    top2 = np.sort(lf, axis=-1)
    margin = top2[:, -1] - top2[:, -2]
    decisive = margin > 2 * dev
    assert decisive.any()
    np.testing.assert_array_equal(lf[decisive].argmax(-1), lq[decisive].argmax(-1))

    # cache pytree shape contract: 4-tuple with [L, B, T] f32 scale planes
    cache = lmq.init_cache(2, length=64)
    assert len(cache) == 4
    assert cache[0].dtype == jnp.int8 and cache[2].dtype == jnp.float32
    assert cache[2].shape == (2, 2, 64)
    grown = lmq.grow_cache(cache, 128)
    assert grown[0].shape[2] == 128 and grown[2].shape == (2, 2, 128)


def test_batch_scheduler_kv_quant(monkeypatch):
    """Continuous batching with the int8 KV arena: admit two sessions, decode
    to completion, both produce in-vocab tokens.

    The head bias is pinned so stop rows can't fire: with v2 reference
    semantics only EOS is suppressed pre-min_len (llm.py:157-158), so on
    random-init weights the OTHER stop rows can legally terminate a session
    at step 1 — the machinery under test (arena admit/retire, quantized KV
    writes, block decode) would then be exercised by luck of the sampler."""
    import queue as _q

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.models.qwen2 import Qwen2Config
    from cosyvoice_tpu.runtime.batch_scheduler import LMBatchScheduler

    monkeypatch.setenv("COSY_KV_WRITE", "select")
    qwen = Qwen2Config(hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
                       head_dim=16, intermediate_size=128, vocab_size=256,
                       max_cache_len=256, dtype=jnp.float32, kv_quant=True)
    lm = Qwen2LM(LMConfig(speech_token_size=50, qwen=qwen, block_size=8))
    params = lm.init(jax.random.PRNGKey(0))
    bias = params["params"]["llm_decoder"]["bias"]
    params["params"]["llm_decoder"]["bias"] = bias.at[50:].set(-1e9)
    sched = LMBatchScheduler(lm, params, max_batch=2, prompt_bucket=16)
    rng = np.random.default_rng(1)
    handles = [
        sched.submit(rng.integers(0, 50, (n,)).astype(np.int32), np.ones(n, np.int32), 5, 25)
        for n in (12, 20)
    ]
    for _ in range(10):
        sched.step()
    for h in handles:
        out = []
        while True:
            try:
                item = h._q.get_nowait()
            except _q.Empty:
                break
            if item is None or isinstance(item, BaseException):
                break
            out.append(item)
        toks = np.concatenate(out)
        assert len(toks) == 25  # stop rows pinned off -> runs to max_len
        assert np.all((toks >= 0) & (toks < 50))
