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
