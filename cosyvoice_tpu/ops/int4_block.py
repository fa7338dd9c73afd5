"""Whole-decode-step fused int4 Pallas kernel: ALL transformer layers in ONE
pallas_call (the next rung above ops/int4_fused.py's per-matmul kernels).

Measured on v5e (8.6 MB int4 weights/layer, 24 layers): the per-pallas_call
fixed cost (~13 us) plus per-layer XLA glue put the 2-calls-per-layer int4p
decode at ~31.6 us/layer vs a 10.5 us/layer HBM floor. Fusing the entire
step into one kernel removes 47 of the 48 call launches and ALL inter-layer
XLA ops; measured 25.1 us/layer (0.60 ms/step) — int8-XLA speed (24.6
us/layer) at HALF the weight bytes. The remaining gap to the HBM floor is
VPU nibble-unpack throughput (~17 M weights/layer), not bandwidth or
launches; the offset-binary low nibble + row-sum bias folding (and the
experimental COSY_INT4_UNPACK=fold raw-byte scheme) in ops/int4_fused.py
attack exactly that term.

- grid = (num_layers, J); each layer streams its weights double-buffered by
  the Pallas pipeline while the previous cell computes, and runs norm ->
  qkv+bias -> rope -> attention -> o_proj -> norm -> SwiGLU MLP ->
  residuals entirely in VMEM. The SwiGLU intermediate dim is split into J
  chunks (second grid axis, attention on chunk 0 only) so the
  double-buffered working set fits the ~16 MB VMEM.
- the KV arena is a read-only input; the new K/V rows come back as outputs
  [L, Hkv*d] and the caller commits them with ONE XLA dynamic_update_slice
  into the stacked arena (keeps the kernel free of aliasing hazards). The
  current token's self-attention term uses the fresh in-register k/v, so
  the stale arena row at `pos` is never read (it is masked off).
- GQA without per-head lane slicing: q is zero-spread to the kv-head lane
  layout ([NH, Hkv*d], each head's values in its own group's d-lane span),
  so arena scores/outputs are two full-width MXU dots against the [A,
  Hkv*d] arena tiles.
- the residual stream lives in an f32 VMEM scratch across cells, rounded
  to bf16 at each layer boundary to match the unfused path's numerics.

Same blocked half-split int4 layout as ops/int4_fused.py (pack_gemv_int4 /
pack_gate_up_int4 / pack_down_int4); models/qwen2.py routes single-stream
int4p decode here (quant mode "int4p", B == 1).

Reference roles: vLLM/TensorRT-LLM fused decode engines
(cosyvoice/cli/model.py:281-290, runtime/triton_trtllm/**).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosyvoice_tpu.ops.int4_fused import (
    MLP_INTER_ALIGN,
    _dot,
    _down_dot,
    _gemv_planes,
)

# gate the fused step on arena length: the K/V blocks are double-buffered
# whole, and past this arena size they push the (MLP-chunked) working set
# over the ~16 MB VMEM budget
MAX_FUSED_ARENA = 2048


def _decode_layers_kernel(
    pos_ref,                     # scalar-prefetch [1]: current position
    x_ref,                       # [1, hid] bf16 input (layer-0 residual)
    cos_ref, sin_ref,            # [1, d/2] f32 rope at pos
    ka_ref, va_ref,              # [1, A, Hkv*d] bf16 arena (this layer)
    nw1_ref, nw2_ref,            # [1, 1, hid] f32 norm weights
    qkvp_ref, qkvs_ref, qkvb_ref,  # [1, nbq, half, nqkv] / [1, nbq, nqkv] / [1, 1, nqkv]
    op_ref, os_ref,              # [1, nbo, half, hid] / [1, nbo, hid]
    gup_ref, gus_ref,            # [1, 2*nb, half, interp] / [1, 2*nb, interp]
    dp_ref, ds_ref,              # [1, nd, halfd, hid] / [1, nd, 1, hid]
    xo_ref, kn_ref, vn_ref,      # out: [1, hid], [1, 1, Hkv*d], [1, 1, Hkv*d]
    xs,                          # scratch: [1, hid] f32 residual stream
    q2s,                         # scratch: [NH, Hkv*d] f32 spread-q staging
    attns,                       # scratch: [1, NH*d] f32 attn-out staging
    x2s,                         # scratch: [1, hid] f32 post-attn residual accum
    h2s,                         # scratch: [1, hid] f32 post-attn normed activ
    *,
    n_layers: int, hid: int, n_heads: int, n_kv: int, d: int,
    arena: int, eps: float,
):
    l, jc = pl.program_id(0), pl.program_id(1)
    n_chunks = pl.num_programs(1)
    rep = n_heads // n_kv
    nq = n_heads * d
    kv_lanes = n_kv * d
    nbq, halfq = qkvp_ref.shape[1], qkvp_ref.shape[2]
    nbo = op_ref.shape[1]
    nb_in = gup_ref.shape[1] // 2
    half_in = gup_ref.shape[2]
    n_sub = dp_ref.shape[1]  # down-proj sub-blocks in THIS mlp chunk

    @pl.when(jc == 0)
    def _attention_phase():
        @pl.when(l == 0)
        def _():
            xs[:] = x_ref[:].astype(jnp.float32)

        x = xs[:]  # [1, hid] f32 residual

        # ---- input norm + fused qkv gemv + bias ----
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        hnorm = (x * jax.lax.rsqrt(var + eps) * nw1_ref[0]).astype(jnp.bfloat16)
        qkv = _gemv_planes(hnorm, qkvp_ref[0], qkvs_ref[0], nbq, halfq, hid)
        qkv = qkv + qkvb_ref[0]  # [1, nq + 2*kv_lanes] f32

        # ---- rope (half-split rotation, nn/embedding.py:apply_rope) ----
        # Mosaic can't reshape-split a [1, H*d] row into [H, d] ("unsupported
        # shape cast") and rejects lane-concat of slices with mismatched
        # layouts, so rotate blockwise in row layout: the rotation partner
        # (the two halves of every d-lane block swapped) is built with two
        # full-row lane rolls + an iota select, and cos/sin are pre-tiled rows.
        d2 = d // 2
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, nq), 1) % d
        lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, kv_lanes), 1) % d

        def rope_row(row, lane, cos_t, sin_t):  # [1, nb*d] f32
            n = row.shape[1]
            partner = jnp.where(
                lane < d2,
                pltpu.roll(row, n - d2, axis=1),  # first half <- its x2 (same block)
                pltpu.roll(row, d2, axis=1),      # second half <- its x1
            )
            return row * cos_t + partner * sin_t

        cos_k = pltpu.repeat(cos_ref[:], 2 * n_kv, axis=1)             # [1, Hkv*d]
        sin_k = pltpu.repeat(sin_ref[:], 2 * n_kv, axis=1) * jnp.where(lane_k < d2, -1.0, 1.0)
        cos_q = pltpu.repeat(cos_ref[:], 2 * n_heads, axis=1)          # [1, NH*d]
        sin_q = pltpu.repeat(sin_ref[:], 2 * n_heads, axis=1) * jnp.where(lane_q < d2, -1.0, 1.0)

        q_row = rope_row(qkv[:, :nq], lane_q, cos_q, sin_q) * (1.0 / np.sqrt(d))
        kn_row = rope_row(qkv[:, nq : nq + kv_lanes], lane_k, cos_k, sin_k)
        vn_row = qkv[:, nq + kv_lanes :]                               # [1, Hkv*d]
        kn_ref[0] = kn_row.astype(kn_ref.dtype)
        vn_ref[0] = vn_row.astype(vn_ref.dtype)

        # ---- attention over the arena + the fresh self row ----
        # zero-spread q to the arena's lane layout: head h occupies its kv
        # group's d-lane span, zeros elsewhere, so one [NH, Hkv*d] x [Hkv*d,
        # A] dot contracts each head only against its own group's keys.
        # Built via VMEM scratch stores (layout-normalizing; lane-concat of
        # oddly-offset slices is rejected by the Mosaic layout pass).
        q2s[:] = jnp.zeros((n_heads, kv_lanes), jnp.float32)
        for h in range(n_heads):
            g = h // rep
            q2s[h : h + 1, g * d : (g + 1) * d] = q_row[:, h * d : (h + 1) * d]
        q2 = q2s[:].astype(jnp.bfloat16)                               # [NH, Hkv*d]

        pos = pos_ref[0]
        ka = ka_ref[0]                                                 # [A, Hkv*d] bf16
        va = va_ref[0]
        sc = jax.lax.dot_general(
            q2, ka, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                              # [NH, A]
        mask = jax.lax.broadcasted_iota(jnp.int32, (1, arena), 1) < pos
        sc = jnp.where(mask, sc, jnp.float32(-1e30))
        # degenerate [NH, 1] bf16 dot trips a Mosaic verifier bug (bf16->f32
        # vector.broadcast); self-score as a VPU multiply-reduce instead
        s_self = jnp.sum(
            q2.astype(jnp.float32) * kn_row.astype(jnp.float32), axis=-1, keepdims=True
        )                                                              # [NH, 1]
        m = jnp.maximum(jnp.max(sc, axis=-1, keepdims=True), s_self)
        p = jnp.where(mask, jnp.exp(sc - m), 0.0)
        p_self = jnp.exp(s_self - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + p_self
        out2 = _dot(p.astype(jnp.bfloat16), va)                        # [NH, Hkv*d] f32
        out2 = (out2 + p_self * vn_row) / denom
        # head h's payload sits in its group's d-lane span; lay the heads
        # back out on lanes through the scratch (layout normalization again)
        for h in range(n_heads):
            g = h // rep
            attns[0:1, h * d : (h + 1) * d] = out2[h : h + 1, g * d : (g + 1) * d]
        attn_row = attns[:].astype(jnp.bfloat16)                       # [1, NH*d]

        # ---- o_proj + residual + post-attention norm ----
        o = _gemv_planes(attn_row, op_ref[0], os_ref[0], nbo, halfq, nq)
        x2 = x + o
        x2s[:] = x2
        var2 = jnp.mean(x2 * x2, axis=-1, keepdims=True)
        h2s[:] = x2 * jax.lax.rsqrt(var2 + eps) * nw2_ref[0]

    # ---- SwiGLU MLP, one intermediate-dim chunk per jc step (bounds the
    # double-buffered VMEM working set; chunks accumulate into x2s) ----
    h2 = h2s[:].astype(jnp.bfloat16)
    gate = _gemv_planes(h2, gup_ref[0, :nb_in], gus_ref[0, :nb_in], nb_in, half_in, hid)
    up = _gemv_planes(h2, gup_ref[0, nb_in:], gus_ref[0, nb_in:], nb_in, half_in, hid)
    act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)      # [1, inter_chunk]
    mlp = None
    for j in range(n_sub):
        al = act[:, j * MLP_INTER_ALIGN : j * MLP_INTER_ALIGN + MLP_INTER_ALIGN // 2]
        ah = act[:, j * MLP_INTER_ALIGN + MLP_INTER_ALIGN // 2 : (j + 1) * MLP_INTER_ALIGN]
        part = _down_dot(dp_ref[0, j], al, ah)
        part = part * ds_ref[0, j, 0][None, :]
        mlp = part if mlp is None else mlp + part
    x2s[:] = x2s[:] + mlp

    @pl.when(jc == n_chunks - 1)
    def _layer_boundary():
        # round to bf16 at the layer boundary to match the unfused path
        xs[:] = x2s[:].astype(jnp.bfloat16).astype(jnp.float32)

        @pl.when(l == n_layers - 1)
        def _():
            xo_ref[:] = xs[:].astype(xo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "interpret"))
def int4_decode_layers(
    x, cos, sin, pos, k_arena, v_arena, nw1, nw2,
    qkv_p, qkv_s, qkv_b, o_p, o_s, gu_p, gu_s, d_p, d_s,
    eps: float = 1e-6, out_dtype=jnp.bfloat16, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run every transformer layer of one decode step in ONE pallas_call.

    x:        [1, hid] layer-0 input (post-embedding)
    cos/sin:  [1, d/2] rope tables at `pos`
    pos:      [] int32 current position (arena keys < pos are visible; the
              stale arena row AT pos is masked, the fresh k/v self term is
              added in-register)
    k_arena/v_arena: [L, A, Hkv*d] stacked KV (read-only)
    nw1/nw2:  [L, hid] input / post-attention RMSNorm weights
    qkv_p/s/b: [L, nbq, half, nqkv] / [L, nbq, nqkv] / [L, nqkv]
    o_p/s:    [L, nbo, half, hid] / [L, nbo, hid]
    gu_p/s:   [L, 2, nb, half, inter_p] / [L, 2, nb, inter_p] (gate, up)
    d_p/s:    [L, nd, halfd, hid] / [L, nd, hid]

    Returns (x_out [1, hid] pre-final-norm hidden, k_new [L, Hkv*d],
    v_new [L, Hkv*d]); commit the rows with one dynamic_update_slice:
        arena = jax.lax.dynamic_update_slice(arena, new[:, None], (0, pos, 0))
    """
    L, A, kv_lanes = k_arena.shape
    hid = x.shape[-1]
    d = 2 * cos.shape[-1]
    n_kv = kv_lanes // d
    nqkv = qkv_p.shape[-1]
    n_heads = (nqkv - 2 * kv_lanes) // d
    inter_p = gu_p.shape[-1]
    nbq, halfq = qkv_p.shape[1], qkv_p.shape[2]
    nbo = o_p.shape[1]
    nb_in, half_in = gu_p.shape[2], gu_p.shape[3]
    nd, halfd = d_p.shape[1], d_p.shape[2]
    # MLP chunking: the whole-layer weight block double-buffered must fit the
    # ~16 MB VMEM. The SwiGLU intermediate dim decomposes cleanly, so stream
    # gate_up/down in J chunks (J | nd); attention runs on chunk 0 only.
    budget = 13 * 1024 * 1024
    fixed_b = 2 * (
        (qkv_p.nbytes + qkv_s.nbytes + qkv_b.nbytes + o_p.nbytes + o_s.nbytes
         + nw1.nbytes * 4 + nw2.nbytes * 4) // L
        + 2 * A * kv_lanes * 2
    )
    mlp_b = 2 * (gu_p.nbytes + gu_s.nbytes * 4 + d_p.nbytes + d_s.nbytes * 4) // L
    J = next(
        (j for j in range(1, nd + 1) if nd % j == 0 and fixed_b + mlp_b // j <= budget),
        nd,
    )
    kern = functools.partial(
        _decode_layers_kernel,
        n_layers=L, hid=hid, n_heads=n_heads, n_kv=n_kv, d=d, arena=A, eps=eps,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, J),
        in_specs=[
            pl.BlockSpec((1, hid), lambda l, j, p: (0, 0)),
            pl.BlockSpec((1, d // 2), lambda l, j, p: (0, 0)),
            pl.BlockSpec((1, d // 2), lambda l, j, p: (0, 0)),
            pl.BlockSpec((1, A, kv_lanes), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, A, kv_lanes), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, 1, hid), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, 1, hid), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, nbq, halfq, nqkv), lambda l, j, p: (l, 0, 0, 0)),
            pl.BlockSpec((1, nbq, nqkv), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, 1, nqkv), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, nbo, halfq, hid), lambda l, j, p: (l, 0, 0, 0)),
            pl.BlockSpec((1, nbo, hid), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, 2 * nb_in, half_in, inter_p // J), lambda l, j, p: (l, 0, 0, j)),
            pl.BlockSpec((1, 2 * nb_in, inter_p // J), lambda l, j, p: (l, 0, j)),
            pl.BlockSpec((1, nd // J, halfd, hid), lambda l, j, p: (l, j, 0, 0)),
            pl.BlockSpec((1, nd // J, 1, hid), lambda l, j, p: (l, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, hid), lambda l, j, p: (0, 0)),
            pl.BlockSpec((1, 1, kv_lanes), lambda l, j, p: (l, 0, 0)),
            pl.BlockSpec((1, 1, kv_lanes), lambda l, j, p: (l, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hid), jnp.float32),
            pltpu.VMEM((n_heads, kv_lanes), jnp.float32),
            pltpu.VMEM((1, n_heads * d), jnp.float32),
            pltpu.VMEM((1, hid), jnp.float32),
            pltpu.VMEM((1, hid), jnp.float32),
        ],
    )
    xo, kn, vn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, hid), out_dtype),
            jax.ShapeDtypeStruct((L, 1, kv_lanes), k_arena.dtype),
            jax.ShapeDtypeStruct((L, 1, kv_lanes), v_arena.dtype),
        ],
        interpret=interpret,
    )(
        jnp.asarray(pos, jnp.int32).reshape(1),
        x.astype(jnp.bfloat16), cos.astype(jnp.float32), sin.astype(jnp.float32),
        k_arena, v_arena,
        nw1.astype(jnp.float32)[:, None, :], nw2.astype(jnp.float32)[:, None, :],
        qkv_p, qkv_s.astype(jnp.float32), qkv_b.astype(jnp.float32)[:, None, :],
        o_p, o_s.astype(jnp.float32),
        gu_p.reshape(L, 2 * nb_in, half_in, inter_p),
        gu_s.astype(jnp.float32).reshape(L, 2 * nb_in, inter_p),
        d_p, d_s[:, :, None, :].astype(jnp.float32),
    )
    return xo, kn[:, 0], vn[:, 0]


def int4_decode_layers_reference(
    x, cos, sin, pos, k_arena, v_arena, nw1, nw2,
    qkv_p, qkv_s, qkv_b, o_p, o_s, gu_p, gu_s, d_p, d_s,
    eps: float = 1e-6, out_dtype=jnp.bfloat16,
):
    """XLA reference with the same layouts/semantics (tests/CPU)."""
    from cosyvoice_tpu.ops.int4_fused import int4_matmul_blocked

    L, A, kv_lanes = k_arena.shape
    hid = x.shape[-1]
    d = 2 * cos.shape[-1]
    n_kv = kv_lanes // d
    nqkv = qkv_p.shape[-1]
    n_heads = (nqkv - 2 * kv_lanes) // d
    rep = n_heads // n_kv

    def rope(hd):
        d2 = d // 2
        x1, x2 = hd[:, :d2], hd[:, d2:]
        return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)

    x = x.astype(jnp.float32)
    kns, vns = [], []
    for l in range(L):
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        h = (x * jax.lax.rsqrt(var + eps) * nw1[l][None, :]).astype(jnp.bfloat16)
        qkv = int4_matmul_blocked(h, qkv_p[l], qkv_s[l], jnp.float32) + qkv_b[l][None, :]
        nq = n_heads * d
        q = rope(qkv[:, :nq].reshape(n_heads, d)) / np.sqrt(d)
        kn = rope(qkv[:, nq : nq + kv_lanes].reshape(n_kv, d))
        vn = qkv[:, nq + kv_lanes :].reshape(n_kv, d)
        kns.append(kn.reshape(kv_lanes))
        vns.append(vn.reshape(kv_lanes))
        ka = k_arena[l].reshape(A, n_kv, d).astype(jnp.float32)
        va = v_arena[l].reshape(A, n_kv, d).astype(jnp.float32)
        outs = []
        for g in range(n_kv):
            qg = q[g * rep : (g + 1) * rep]
            sc = qg @ ka[:, g].T
            sc = jnp.where(jnp.arange(A)[None, :] < pos, sc, -1e30)
            s_self = qg @ kn[g][:, None]
            m = jnp.maximum(jnp.max(sc, -1, keepdims=True), s_self)
            p = jnp.where(jnp.arange(A)[None, :] < pos, jnp.exp(sc - m), 0.0)
            p_self = jnp.exp(s_self - m)
            og = (p @ va[:, g] + p_self * vn[g][None, :]) / (
                jnp.sum(p, -1, keepdims=True) + p_self
            )
            outs.append(og)
        attn_row = jnp.concatenate(outs, 0).reshape(1, nq).astype(jnp.bfloat16)
        o = int4_matmul_blocked(attn_row, o_p[l], o_s[l], jnp.float32)
        x2 = x + o
        var2 = jnp.mean(x2 * x2, axis=-1, keepdims=True)
        h2 = (x2 * jax.lax.rsqrt(var2 + eps) * nw2[l][None, :]).astype(jnp.bfloat16)
        gate = int4_matmul_blocked(h2, gu_p[l, 0], gu_s[l, 0], jnp.float32)
        up = int4_matmul_blocked(h2, gu_p[l, 1], gu_s[l, 1], jnp.float32)
        act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)
        mlp = int4_matmul_blocked(act, d_p[l], d_s[l], jnp.float32)
        x = (x2 + mlp).astype(jnp.bfloat16).astype(jnp.float32)
    return (
        x.astype(out_dtype),
        jnp.stack(kns).astype(k_arena.dtype),
        jnp.stack(vns).astype(v_arena.dtype),
    )


def stack_decode_params(layer_trees):
    """[per-layer qwen2 int4p param dicts] -> stacked kwargs for
    int4_decode_layers. Layer tree layout (models/qwen2.py, quant='int4p'):
    {input_layernorm: {weight}, self_attn: {qkv_proj: {kernel_q4b, scale4,
    bias}, o_proj: {kernel_q4b, scale4}}, post_attention_layernorm:
    {weight}, mlp: {gate_up_proj, down_proj: {kernel_q4b, scale4}}}."""

    def st(*path):
        def get(t):
            for k in path:
                t = t[k]
            return t

        return jnp.stack([jnp.asarray(get(t)) for t in layer_trees])

    return dict(
        nw1=st("input_layernorm", "weight"),
        nw2=st("post_attention_layernorm", "weight"),
        qkv_p=st("self_attn", "qkv_proj", "kernel_q4b"),
        qkv_s=st("self_attn", "qkv_proj", "scale4"),
        qkv_b=st("self_attn", "qkv_proj", "bias"),
        o_p=st("self_attn", "o_proj", "kernel_q4b"),
        o_s=st("self_attn", "o_proj", "scale4"),
        gu_p=st("mlp", "gate_up_proj", "kernel_q4b"),
        gu_s=st("mlp", "gate_up_proj", "scale4"),
        d_p=st("mlp", "down_proj", "kernel_q4b"),
        d_s=st("mlp", "down_proj", "scale4"),
    )
