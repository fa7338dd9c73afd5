"""Pallas TPU flash-decode attention over the preallocated KV arena.

The LM decode hot loop (models/qwen2.py decode_step/decode_step_ragged) is the
TPU-native replacement for the reference's vLLM paged attention
(cosyvoice/cli/model.py:281-290, cosyvoice/llm/llm.py:506-534). The baseline
XLA path attends with one masked einsum over the FULL arena [B, T_max, Hkv, d]
every step — at T_max=4096 and batch 8 that streams ~400 MB of dead arena from
HBM per decode step (the dominant cost of batched decode, measured at the HBM
bandwidth limit).

This kernel makes decode-attention HBM traffic proportional to the true
sequence length: grid (B,), and per row an inner fori_loop walks only the
ceil((cur_len+1)/BLK) live KV blocks, double-buffering manual HBM->VMEM DMAs
so the next block streams while the current one computes. Dead arena blocks
are never touched.

GQA is computed grouped (one [rep, d] x [d, BLK] matmul per KV head) — the
head-repeated KV is never materialized, matching the einsum path's contract.
The arena is viewed as [B, T, Hkv*d] so DMA slices are lane-aligned (Hkv*d
must be a multiple of 128 — true for the Qwen2-0.5B layout 2*64).

Numerics: fp32 flash accumulation (running max / renormalized sum), identical
masking rule to the XLA path (key position <= cur_len, i.e. the current
token's KV has already been written at cur_len).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    lens_ref,  # scalar prefetch [B]
    q_ref,  # [1, Hq, d] VMEM (row b)
    k_hbm,  # [B, T, F] ANY/HBM
    v_hbm,  # [B, T, F] ANY/HBM
    o_ref,  # [1, Hq, d] VMEM
    k_buf,  # [2, BLK, F] VMEM scratch
    v_buf,  # [2, BLK, F] VMEM scratch
    sem,  # DMA semaphores [2, 2]
    *,
    blk,
    hkv,
    rep,
    scale,
):
    b = pl.program_id(0)
    cur_len = lens_ref[b]
    n_blocks = cur_len // blk + 1  # live blocks
    d = q_ref.shape[2]
    hq = q_ref.shape[1]

    def kv_dma(slot, i):
        return (
            pltpu.make_async_copy(k_hbm.at[b, pl.ds(i * blk, blk)], k_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[b, pl.ds(i * blk, blk)], v_buf.at[slot], sem.at[slot, 1]),
        )

    for dma in kv_dma(0, 0):
        dma.start()

    q = q_ref[0].astype(jnp.float32)  # [Hq, d]

    def body(i, carry):
        m, l, acc = carry  # [Hq,1], [Hq,1], [Hq,d] fp32
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            for dma in kv_dma(next_slot, i + 1):
                dma.start()

        for dma in kv_dma(slot, i):
            dma.wait()

        kb = k_buf[slot]  # [BLK, F]
        vb = v_buf[slot]
        pos = i * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        key_mask = pos <= cur_len  # [1, BLK]

        s_groups = []
        for g in range(hkv):
            qg = q[g * rep : (g + 1) * rep]  # [rep, d]
            kg = kb[:, g * d : (g + 1) * d].astype(jnp.float32)  # [BLK, d]
            s_groups.append(
                jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        s = jnp.concatenate(s_groups, axis=0) * scale  # [Hq, BLK]
        s = jnp.where(key_mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o_groups = []
        for g in range(hkv):
            pg = p[g * rep : (g + 1) * rep]
            vg = vb[:, g * d : (g + 1) * d].astype(jnp.float32)
            o_groups.append(
                jax.lax.dot_general(
                    pg, vg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        pv = jnp.concatenate(o_groups, axis=0)  # [Hq, d]
        return m_new, l_new, acc * corr + pv

    init = (
        jnp.full((hq, 1), NEG_INF, jnp.float32),
        jnp.zeros((hq, 1), jnp.float32),
        jnp.zeros((hq, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, init)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _quant_decode_kernel(
    lens_ref,  # scalar prefetch [B]
    q_ref,  # [1, Hq, d] VMEM (row b)
    k_hbm,  # [B, T, F] int8 ANY/HBM
    v_hbm,  # [B, T, F] int8 ANY/HBM
    ks_hbm,  # [B, 1, T] f32 per-token k scales
    vs_hbm,  # [B, 1, T] f32 per-token v scales
    o_ref,  # [1, Hq, d] VMEM
    k_buf,  # [2, BLK, F] int8 VMEM scratch
    v_buf,  # [2, BLK, F] int8 VMEM scratch
    ks_buf,  # [2, 1, BLK] f32 VMEM scratch
    vs_buf,  # [2, 1, BLK] f32 VMEM scratch
    sem,  # DMA semaphores [2, 4]
    *,
    blk,
    hkv,
    rep,
    scale,
):
    """int8-KV flash decode: identical flash recurrence to _decode_kernel, but
    the arena streams as int8 (+4 B/token of scales) — half the HBM read
    bytes of the bf16 arena. Dequantization never touches the [BLK, F] tiles:
    the per-token k scale is applied to the score COLUMNS after the q.k_q
    matmul, and the v scale is folded into the softmax weights before the
    p.v_q matmul (exact for per-token scales)."""
    b = pl.program_id(0)
    cur_len = lens_ref[b]
    n_blocks = cur_len // blk + 1  # live blocks
    d = q_ref.shape[2]
    hq = q_ref.shape[1]

    def kv_dma(slot, i):
        return (
            pltpu.make_async_copy(k_hbm.at[b, pl.ds(i * blk, blk)], k_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[b, pl.ds(i * blk, blk)], v_buf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(ks_hbm.at[b, :, pl.ds(i * blk, blk)], ks_buf.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(vs_hbm.at[b, :, pl.ds(i * blk, blk)], vs_buf.at[slot], sem.at[slot, 3]),
        )

    for dma in kv_dma(0, 0):
        dma.start()

    q = q_ref[0].astype(jnp.float32)  # [Hq, d]

    def body(i, carry):
        m, l, acc = carry  # [Hq,1], [Hq,1], [Hq,d] fp32
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            for dma in kv_dma(next_slot, i + 1):
                dma.start()

        for dma in kv_dma(slot, i):
            dma.wait()

        kb = k_buf[slot]  # [BLK, F] int8
        vb = v_buf[slot]
        ksc = ks_buf[slot]  # [1, BLK] f32
        vsc = vs_buf[slot]
        pos = i * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        key_mask = pos <= cur_len  # [1, BLK]

        s_groups = []
        for g in range(hkv):
            qg = q[g * rep : (g + 1) * rep]  # [rep, d]
            kg = kb[:, g * d : (g + 1) * d].astype(jnp.float32)  # [BLK, d]
            s_groups.append(
                jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        s = jnp.concatenate(s_groups, axis=0) * (ksc * scale)  # [Hq, BLK] column-dequant
        s = jnp.where(key_mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv_weights = p * vsc  # fold v dequant into the softmax weights
        o_groups = []
        for g in range(hkv):
            pg = pv_weights[g * rep : (g + 1) * rep]
            vg = vb[:, g * d : (g + 1) * d].astype(jnp.float32)
            o_groups.append(
                jax.lax.dot_general(
                    pg, vg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        pv = jnp.concatenate(o_groups, axis=0)  # [Hq, d]
        return m_new, l_new, acc * corr + pv

    init = (
        jnp.full((hq, 1), NEG_INF, jnp.float32),
        jnp.zeros((hq, 1), jnp.float32),
        jnp.zeros((hq, d), jnp.float32),
    )
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, init)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_decode_wanted(T: int, F: int, block_size: int = 512):
    """Decide whether the decode step should route attention through the
    Pallas flash-decode kernel instead of the masked full-arena einsum.

    Returns None (use einsum) or the `interpret` flag to pass. Env
    COSY_FLASH_DECODE: "auto" (default, on-TPU only), "0" (off), "force"
    (on anywhere — interpret mode off-TPU, for tests)."""
    import os

    mode = os.environ.get("COSY_FLASH_DECODE", "auto")
    if mode == "0":
        return None
    blk = min(block_size, T)
    if F % 128 != 0 or T % blk != 0:
        return None
    if mode == "force":
        return jax.default_backend() != "tpu"
    if jax.default_backend() != "tpu":
        return None
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None and getattr(dev, "platform", "tpu") != "tpu":
        return None
    return False


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def gqa_decode_attention(q, k_arena, v_arena, cur_len, block_size: int = 512, interpret: bool = False):
    """Single-token GQA attention against a length-masked KV arena.

    q: [B, Hq, d] query for the current token (rope already applied).
    k_arena/v_arena: [B, T_max, Hkv, d]; positions <= cur_len[b] are live
    (the current token's KV must already be written at cur_len[b]).
    cur_len: [B] int32. Returns [B, Hq, d] in q.dtype.
    """
    B, Hq, d = q.shape
    T = k_arena.shape[1]
    Hkv = k_arena.shape[2]
    rep = Hq // Hkv
    F = Hkv * d
    assert F % 128 == 0, f"Hkv*d={F} must be lane-aligned (128) for the arena DMA view"
    blk = min(block_size, T)
    assert T % blk == 0, f"arena {T} not divisible by block {blk}"
    scale = 1.0 / np.sqrt(d)

    kf = k_arena.reshape(B, T, F)
    vf = v_arena.reshape(B, T, F)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, d), lambda b, lens: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, Hq, d), lambda b, lens: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, blk, F), k_arena.dtype),
            pltpu.VMEM((2, blk, F), v_arena.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_decode_kernel, blk=blk, hkv=Hkv, rep=rep, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, d), q.dtype),
        interpret=interpret,
    )(cur_len.astype(jnp.int32), q, kf, vf)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def gqa_decode_attention_quant(
    q, k_arena, v_arena, k_scale, v_scale, cur_len, block_size: int = 512, interpret: bool = False
):
    """Single-token GQA attention against an int8-quantized KV arena.

    q: [B, Hq, d] (rope applied). k_arena/v_arena: [B, T, Hkv, d] int8,
    per-token absmax rows; k_scale/v_scale: [B, T] f32 dequant scales
    (shared across KV heads — see quantize_kv_rows). cur_len: [B] int32.
    Returns [B, Hq, d] in q.dtype. HBM arena traffic is half the bf16
    kernel's (1 B/elem + 8 B/token of scales)."""
    B, Hq, d = q.shape
    T = k_arena.shape[1]
    Hkv = k_arena.shape[2]
    rep = Hq // Hkv
    F = Hkv * d
    assert F % 128 == 0, f"Hkv*d={F} must be lane-aligned (128) for the arena DMA view"
    blk = min(block_size, T)
    assert T % blk == 0, f"arena {T} not divisible by block {blk}"
    scale = 1.0 / np.sqrt(d)

    kf = k_arena.reshape(B, T, F)
    vf = v_arena.reshape(B, T, F)
    ks = k_scale.astype(jnp.float32).reshape(B, 1, T)
    vs = v_scale.astype(jnp.float32).reshape(B, 1, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, d), lambda b, lens: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, Hq, d), lambda b, lens: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, blk, F), jnp.int8),
            pltpu.VMEM((2, blk, F), jnp.int8),
            pltpu.VMEM((2, 1, blk), jnp.float32),
            pltpu.VMEM((2, 1, blk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    kernel = functools.partial(_quant_decode_kernel, blk=blk, hkv=Hkv, rep=rep, scale=scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, d), q.dtype),
        interpret=interpret,
    )(cur_len.astype(jnp.int32), q, kf, vf, ks, vs)


def quantize_kv_rows(x, eps: float = 1e-6):
    """Per-token absmax int8 quantization of new KV rows.

    x: [B, S, Hkv, d] -> (q int8 [B, S, Hkv, d], scale f32 [B, S]). One
    scale per token row across all KV heads keeps the scale arena a flat
    lane-aligned [B, T] f32 the decode kernel can DMA in [1, BLK] slices."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=(2, 3))  # [B, S]
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.round(x32 / scale[:, :, None, None]).astype(jnp.int8)
    return q, scale


def dequantize_kv_arena(arena_q, scale, dtype):
    """Inverse of quantize_kv_rows over a whole arena (the XLA fallback /
    prefill path — the upcast+scale fuses into the attention einsum).

    The scale multiply stays in f32 (matching the flash kernel's f32 column
    dequant) and only the product is cast, so the fallback and kernel paths
    agree to quantization error rather than diverging by bf16 scale rounding."""
    return (arena_q.astype(jnp.float32) * scale[:, :, None, None]).astype(dtype)


def gqa_decode_attention_quant_reference(q, k_arena, v_arena, k_scale, v_scale, cur_len):
    """XLA reference for the quantized kernel (exact same dequant math)."""
    kd = dequantize_kv_arena(k_arena, k_scale, jnp.float32)
    vd = dequantize_kv_arena(v_arena, v_scale, jnp.float32)
    return gqa_decode_attention_reference(q, kd, vd, cur_len)


def gqa_decode_attention_reference(q, k_arena, v_arena, cur_len):
    """XLA reference (the einsum path in models/qwen2.py), for tests."""
    B, Hq, d = q.shape
    Hkv = k_arena.shape[2]
    rep = Hq // Hkv
    qg = q.reshape(B, 1, Hkv, rep, d)
    scores = jnp.einsum("bsgrd,btgd->bgrst", qg, k_arena).astype(jnp.float32) / np.sqrt(d)
    key_pos = jnp.arange(k_arena.shape[1])
    valid = key_pos[None, :] <= cur_len[:, None]
    scores = jnp.where(valid[:, None, None, None, :], scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1).astype(v_arena.dtype)
    out = jnp.einsum("bgrst,btgd->bsgrd", attn, v_arena).reshape(B, 1, Hq * d)
    return out.reshape(B, Hq, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# per-row KV arena write (ragged decode): replaces the full-arena
# jnp.where(sel, new, arena) rewrite — O(arena) HBM write per layer per step —
# with one row-sized DMA per batch row.
# ---------------------------------------------------------------------------


_KV_GROUP = 8  # sublane tile for >=2-byte dtypes: smallest T-aligned block


def _kv_group(dtype) -> int:
    """Smallest legal T-block for the row write given the arena dtype's
    sublane tiling: 8 rows for f32/bf16, 32 for int8."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else _KV_GROUP


def _kv_write_kernel(pos_ref, new_ref, group_ref, out_ref, *, group):
    b = pl.program_id(0)
    row = jax.lax.rem(pos_ref[b], group)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (group, 1), 0)
    out_ref[0] = jnp.where(rowid == row, new_ref[0], group_ref[0])


def kv_arena_write_traced(arena, new_kv, pos, interpret: bool = False):
    """Trace-time variant of kv_arena_write for use inside jitted model code
    (no jit wrapper / donation — the enclosing program owns buffer lifetime)."""
    return _kv_arena_write(arena, new_kv, pos, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0,))
def kv_arena_write(arena, new_kv, pos, interpret: bool = False):
    """Write new_kv[b] into arena[b, pos[b]] in place (donated).

    Reads+rewrites only the 8-row tile-aligned group holding pos[b] (the
    smallest legal block for bf16 sublane tiling) instead of the whole arena.

    arena: [B, T, Hkv, d]; new_kv: [B, 1, Hkv, d]; pos: [B] int32."""
    return _kv_arena_write(arena, new_kv, pos, interpret)


def _kv_arena_write(arena, new_kv, pos, interpret: bool = False):
    B, T, Hkv, d = arena.shape
    F = Hkv * d
    group = _kv_group(arena.dtype)
    assert F % 128 == 0, f"Hkv*d={F} must be lane-aligned (128) for the arena view"
    assert T % group == 0

    def group_map(b, pos):
        return (b, pos[b] // group, 0)

    out = pl.pallas_call(
        functools.partial(_kv_write_kernel, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1, F), lambda b, pos: (b, 0, 0)),
                pl.BlockSpec((1, group, F), group_map),
            ],
            out_specs=pl.BlockSpec((1, group, F), group_map),
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, F), arena.dtype),
        input_output_aliases={2: 0},  # arena (incl. scalar prefetch idx) -> out
        interpret=interpret,
    )(pos.astype(jnp.int32), new_kv.astype(arena.dtype).reshape(B, 1, F), arena.reshape(B, T, F))
    return out.reshape(B, T, Hkv, d)
