"""Fused int4 weight-only Pallas decode kernels (the TRT-LLM int4 role).

`ops/quant.py` documents why plain-XLA int4 decode is capped: the nibble
unpack is not operand-fused into the dot. A naive one-Pallas-call-per-matmul
port is capped by something subtler, measured on v5e: tiny XLA glue ops
BETWEEN pallas calls (transposes, slices, dtype casts of [1, 896] vectors)
cost 10-40 us each in a dependent chain — far more than the kernels
themselves. These kernels are therefore designed to need NO glue:

- **Blocked half-split layout**: a weight [n_in, n_out] is stored as
  packed [NB, half, n_out] int8 where block b packs input rows
  [b*g, b*g+half) in the low nibble and [b*g+half, b*g+2*half) in the high
  nibble (g = 2*half = n_in/NB), with per-(block, out-col) scales
  [NB, n_out]. The dequant scale is applied to each block's [B, BO] dot
  OUTPUT — not to the unpacked weights — so VPU scaling work is O(B*n_out)
  per block, not O(n_in*n_out).
- Input rows are padded to GEMV_IN_ALIGN(=256)-multiples so every nibble
  half is a 128-lane plane: kernels slice the ACTIVATION VALUE at 128-lane
  boundaries in-kernel (no pre-blocking transpose in XLA), and dots hit the
  full MXU contraction width. Weight halves that fall entirely in the
  zero-padded row range are skipped at trace time.
- **`int4_gemv`**: one pallas_call per matmul (out-column grid when the
  weights exceed the VMEM budget).
- **`int4_mlp`**: the whole SwiGLU MLP (gate_up + silu*up + down) in ONE
  call; the [B, inter] activation never leaves VMEM. The intermediate dim
  is zero-padded to a 512-multiple (4864 -> 5120 for Qwen2-0.5B) so the
  activation slices feeding `down` stay lane-aligned.
- **`int4_o_mlp`**: o_proj + attention residual + RMSNorm + the whole MLP +
  residual in ONE call — the layer's entire post-attention tail with zero
  XLA glue (norm/residual arithmetic runs on the VPU between the dots).

Decode-path integration: models/qwen2.py quant mode "int4p"
(QuantDense4P + the Qwen2Attention/Qwen2MLP int4p branches);
checkpoint-side layout conversion in ops/quant.py
quantize_lm_params(mode="int4p").

Numerics: same symmetric [-7, 7] grid as ops/quant.py int4 with
per-(input-block, out-channel) absmax scales; block granularity is 256
input rows (vs int4's n_in/8) — the group-quant shape used by TRT-LLM/AWQ
int4 weight-only. bf16 dots, f32 accumulation, f32 norm/residual.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 8  # legacy block count for quantize_tensor_int4_blocked's default

# the MLP kernels pad the intermediate dim to a multiple of this so in-kernel
# activation slices stay lane-aligned (512 = 2 nibble halves x 256 lanes)
MLP_INTER_ALIGN = 512

# gemv/MLP input rows are padded to a multiple of this: scale blocks of 256
# input rows = nibble halves of 128 lanes, so every contraction is a
# [B, 128] x [128, BO] MXU dot and every in-kernel activation slice is
# 128-lane aligned
GEMV_IN_ALIGN = 256


def _sx4(v):
    """Decode the OFFSET-BINARY low nibble of a packed int8 (stored value =
    q + 8, so decode is one and + one sub instead of a 3-op sign-extend)."""
    return (v & 15) - 8


def _unpack32_biased(blk):
    """In-kernel nibble unpack via int32 (Mosaic has no int8 vector shifts).

    Returns (lo_u, hi): the high plane signed (two's complement, recovered
    by the arithmetic shift — i8->i32 kept the sign) and the low plane
    UNDECODED (offset-binary, 0..15, stored as q+8 by
    quantize_tensor_int4_blocked): dot(x, lo_u) - 8*sum(x) == dot(x, q_lo),
    so callers fold the -8 into one [B,1] row-sum correction instead of a
    [half, O] elementwise sub — the unpack hot loop is i8->i32, and, shift
    + two bf16 converts only."""
    v = blk.astype(jnp.int32)
    return v & 15, jnp.right_shift(v, 4)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pad_to(n: int, align: int) -> int:
    return ((n + align - 1) // align) * align


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def quantize_tensor_int4_blocked(
    w: np.ndarray, nb: int = NB
) -> Tuple[np.ndarray, np.ndarray]:
    """w [n_in, n_out] -> (packed [nb, half, n_out] int8, scale [nb, n_out]).

    Same quant grid as ops.quant.quantize_tensor_int4 when nb matches; only
    the byte layout differs (half-split WITHIN each scale block, so a
    block's low/high nibble planes are contiguous input-row ranges)."""
    w = np.asarray(w, np.float32)
    n_in, n_out = w.shape
    assert n_in % (2 * nb) == 0, n_in
    g = n_in // nb
    half = g // 2
    blocks = w.reshape(nb, g, n_out)
    scale = np.max(np.abs(blocks), axis=1, keepdims=True) / 7.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(blocks / scale), -7, 7).astype(np.int8)
    # low nibble offset-binary (q+8 in 1..15): in-kernel decode is and+sub
    # (vs a 3-op sign-extend), and the gemv kernels can skip even the sub by
    # folding -8 into a row-sum correction (_unpack32_biased)
    packed = ((q[:, :half] + 8) & 0x0F) | (q[:, half:] << 4)
    return packed.astype(np.int8), scale[:, 0, :].astype(np.float32)


def unpack_int4_blocked(packed, scale=None, dtype=jnp.float32):
    """packed [nb, half, O] -> dequantized (or raw int4 values if scale is
    None) [nb*2*half, O]; tests/reference."""
    lo = _sx4(packed).astype(dtype)
    hi = jnp.right_shift(packed, 4).astype(dtype)
    w = jnp.concatenate([lo, hi], axis=1)  # [nb, g, O]
    if scale is not None:
        w = w * scale[:, None, :].astype(dtype)
    return w.reshape(-1, packed.shape[-1])


def pack_gemv_int4(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Gemv weight [n_in, n_out] -> (packed [nb, 128, n_out], scale
    [nb, n_out]) with input rows zero-padded to a GEMV_IN_ALIGN multiple
    (nb = padded/256 scale blocks)."""
    w = np.asarray(w, np.float32)
    n_in, n_out = w.shape
    n_in_p = _pad_to(n_in, GEMV_IN_ALIGN)
    wp = np.zeros((n_in_p, n_out), np.float32)
    wp[:n_in] = w
    return quantize_tensor_int4_blocked(wp, nb=n_in_p // GEMV_IN_ALIGN)


def pack_gate_up_int4(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Fused gate|up kernel [n_in, 2*inter] -> (packed [2, nb, 128, inter_p],
    scale [2, nb, inter_p]); input rows padded to a GEMV_IN_ALIGN multiple,
    intermediate columns zero-padded to a MLP_INTER_ALIGN multiple."""
    w = np.asarray(w, np.float32)
    n_in, n2 = w.shape
    inter = n2 // 2
    inter_p = _pad_to(inter, MLP_INTER_ALIGN)
    n_in_p = _pad_to(n_in, GEMV_IN_ALIGN)
    packs, scales = [], []
    for plane in (w[:, :inter], w[:, inter:]):
        wp = np.zeros((n_in_p, inter_p), np.float32)
        wp[:n_in, :inter] = plane
        p, s = quantize_tensor_int4_blocked(wp, nb=n_in_p // GEMV_IN_ALIGN)
        packs.append(p)
        scales.append(s)
    return np.stack(packs), np.stack(scales)


def pack_down_int4(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """down kernel [inter, n_out] -> (packed [inter_p/512, 256, n_out],
    scale [inter_p/512, n_out]); input rows zero-padded to a MLP_INTER_ALIGN
    multiple (scale blocks of 512 rows to match the MLP kernels' aligned
    activation slices)."""
    w = np.asarray(w, np.float32)
    inter, n_out = w.shape
    inter_p = _pad_to(inter, MLP_INTER_ALIGN)
    wp = np.zeros((inter_p, n_out), np.float32)
    wp[:inter] = w
    return quantize_tensor_int4_blocked(wp, nb=inter_p // MLP_INTER_ALIGN)


# ---------------------------------------------------------------------------
# XLA fallbacks (prefill / non-TPU backends / references)
# ---------------------------------------------------------------------------


def int4_matmul_blocked(x, packed, scale, dtype=jnp.bfloat16):
    """XLA fallback: y = x @ dequant(packed, scale); one dot per scale
    block, scale on the dot output. x is lane-padded to the packed rows."""
    nb, half, n_out = packed.shape
    g = 2 * half
    pad = nb * g - x.shape[-1]
    if pad:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
    xd = x.astype(dtype)
    lo = _sx4(packed).astype(dtype)  # [nb, half, O]
    hi = jnp.right_shift(packed, 4).astype(dtype)
    y = 0
    for b in range(nb):
        xb = xd[..., b * g : (b + 1) * g]
        part = jnp.dot(xb[..., :half], lo[b]) + jnp.dot(xb[..., half:], hi[b])
        y = y + part * scale[b][None, :].astype(dtype)
    return y


def int4_mlp_reference(x, gu_packed, gu_scale, down_packed, down_scale, dtype=jnp.bfloat16):
    """XLA fallback/reference for the fused MLP (same padded layouts)."""
    gate = int4_matmul_blocked(x, gu_packed[0], gu_scale[0], dtype)
    up = int4_matmul_blocked(x, gu_packed[1], gu_scale[1], dtype)
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(dtype)
    return int4_matmul_blocked(act, down_packed, down_scale, dtype)


def int4_o_mlp_reference(
    attn, x_res, norm_w, o_packed, o_scale, gu_packed, gu_scale, down_packed, down_scale,
    eps: float = 1e-6, dtype=jnp.bfloat16,
):
    """XLA reference for the fused post-attention tail."""
    o = int4_matmul_blocked(attn, o_packed, o_scale, dtype)
    x2 = x_res.astype(jnp.float32) + o.astype(jnp.float32)
    var = jnp.mean(jnp.square(x2), axis=-1, keepdims=True)
    h2 = (x2 * jax.lax.rsqrt(var + eps) * norm_w[None, :].astype(jnp.float32)).astype(dtype)
    mlp = int4_mlp_reference(h2, gu_packed, gu_scale, down_packed, down_scale, dtype)
    return (x2 + mlp.astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# in-kernel building blocks
# ---------------------------------------------------------------------------


def _lane_pad(x, half: int, cap: int):
    """Pad x's lane dim to a `half` multiple (capped at the packed rows) so
    in-kernel half-slices never overrun; the extra lanes hit zero-padded
    weight rows, so they are inert."""
    n_in = x.shape[-1]
    n_p = min(cap, _pad_to(n_in, half))
    if n_p != n_in:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, n_p - n_in),))
    return x


def _gemv_planes(xb, p_ref, s_ref, nb, half, n_in):
    """Sum of scaled per-plane dots: xb [B, n_in] bf16 VALUE; p_ref
    [nb, half, BO]; s_ref [nb, BO]. Weight halves entirely in the
    zero-padded row range (offset >= n_in) are skipped at trace time.

    The low plane stays BIASED (q+8): dot(x, q+8) - 8*sum(x) == dot(x, q),
    so the per-element -8 over [half, BO] collapses to one [B,1] row-sum —
    the unpack hot loop is i8->i32, and, shift + two bf16 converts only.

    COSY_INT4_UNPACK=fold selects the shift-free variant (read at trace
    time; see _gemv_planes_fold)."""
    import os

    if os.environ.get("COSY_INT4_UNPACK", "fold") == "fold":
        return _gemv_planes_fold(xb, p_ref, s_ref, nb, half, n_in)
    acc = None
    for b in range(nb):
        lo_u, hi = _unpack32_biased(p_ref[b])
        for plane, w in ((0, lo_u), (1, hi)):
            off = b * 2 * half + plane * half
            if off >= n_in:
                continue
            xs = xb[:, off : off + half]
            part = _dot(xs, w.astype(jnp.bfloat16))
            if plane == 0:
                part = part - 8.0 * jnp.sum(xs.astype(jnp.float32), axis=1, keepdims=True)
            part = part * s_ref[b][None, :]
            acc = part if acc is None else acc + part
    return acc  # [B, BO] f32


def _gemv_planes_fold(xb, p_ref, s_ref, nb, half, n_in):
    """Shift-free unpack (experimental, env COSY_INT4_UNPACK=fold): with the
    low nibble stored offset-binary, byte == 16*q_hi + lo_u exactly (two's
    complement), so the high plane's dot is recovered from the RAW byte:

      dot(x_lo, q_lo) + dot(x_hi, q_hi)
        == dot(x_lo - x_hi/16, lo_u) + dot(x_hi/16, byte) - 8*sum(x_lo)

    Per packed byte this needs only an int8 `and` + two i8->bf16 converts
    (no i32 roundtrip, no shift) at the cost of two tiny [B, half]
    activation ops; same two MXU dots. Falls back structurally to the
    lo-only form for blocks whose high half is entirely zero-padding."""
    acc = None
    for b in range(nb):
        v = p_ref[b]
        off = b * 2 * half
        if off >= n_in:
            continue
        lo_u = (v & 15).astype(jnp.bfloat16)
        x_lo = xb[:, off : off + half]
        corr = -8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
        if off + half < n_in:
            x_hi16 = xb[:, off + half : off + 2 * half] * jnp.bfloat16(1.0 / 16.0)
            part = _dot(x_lo - x_hi16, lo_u) + _dot(x_hi16, v.astype(jnp.bfloat16)) + corr
        else:
            part = _dot(x_lo, lo_u) + corr
        part = part * s_ref[b][None, :]
        acc = part if acc is None else acc + part
    return acc  # [B, BO] f32


# ---------------------------------------------------------------------------
# Pallas gemv
# ---------------------------------------------------------------------------


def _gemv_kernel(x_ref, p_ref, s_ref, o_ref, *, nb, half, n_in):
    xb = x_ref[:].astype(jnp.bfloat16)
    o_ref[:] = _gemv_planes(xb, p_ref, s_ref, nb, half, n_in).astype(o_ref.dtype)


def _pick_bo(n_out: int, half: int, nb: int, target_bytes: int = 1_200_000) -> int:
    """Out-column grid block: a single cell whenever the weights fit the
    VMEM budget (fewest per-cell overheads; measured faster than many small
    pipelined blocks for decode gemvs), else the largest 128-multiple
    divisor under the budget."""
    if nb * half * n_out <= target_bytes and n_out % 128 == 0:
        return n_out
    divs = [d for d in range(128, n_out + 1, 128) if n_out % d == 0]
    fitting = [d for d in divs if nb * half * d <= target_bytes and d < n_out]
    if fitting:
        return max(fitting)
    return n_out if n_out in divs else (min(divs) if divs else n_out)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_out", "interpret"))
def int4_gemv(x, packed, scale, out_dtype=jnp.bfloat16, block_out: int = 0, interpret: bool = False):
    """y[B, O] = x[B, n_in] @ dequant(packed [nb, half, O], scale [nb, O]).

    Decode-shaped (small B). The activation is sliced in-kernel at 128-lane
    boundaries — callers pass x as-is, no pre-blocking."""
    B, n_in = x.shape
    nb, half, n_out = packed.shape
    assert n_in <= nb * 2 * half, (x.shape, packed.shape)
    x = _lane_pad(x, half, nb * 2 * half)
    n_in = x.shape[-1]
    bo = block_out or _pick_bo(n_out, half, nb)
    assert n_out % bo == 0 and bo % 128 == 0, (n_out, bo)
    return pl.pallas_call(
        functools.partial(_gemv_kernel, nb=nb, half=half, n_in=n_in),
        grid=(n_out // bo,),
        in_specs=[
            pl.BlockSpec((B, n_in), lambda o: (0, 0)),
            pl.BlockSpec((nb, half, bo), lambda o: (0, 0, o)),
            pl.BlockSpec((nb, bo), lambda o: (0, o)),
        ],
        out_specs=pl.BlockSpec((B, bo), lambda o: (0, o)),
        out_shape=jax.ShapeDtypeStruct((B, n_out), out_dtype),
        interpret=interpret,
    )(x, packed, scale)


def _down_dot(blk, x_lo, x_hi):
    """One down-proj scale block: dot(x_lo, q_lo) + dot(x_hi, q_hi) with the
    -8 low-plane bias folded into a row-sum; COSY_INT4_UNPACK=fold uses the
    shift-free raw-byte identity (see _gemv_planes_fold)."""
    import os

    corr = -8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=1, keepdims=True)
    if os.environ.get("COSY_INT4_UNPACK", "fold") == "fold":
        lo_u = (blk & 15).astype(jnp.bfloat16)
        x_hi16 = x_hi * jnp.bfloat16(1.0 / 16.0)
        return _dot(x_lo - x_hi16, lo_u) + _dot(x_hi16, blk.astype(jnp.bfloat16)) + corr
    lo_u, hi = _unpack32_biased(blk)
    return _dot(x_lo, lo_u.astype(jnp.bfloat16)) + _dot(x_hi, hi.astype(jnp.bfloat16)) + corr


# ---------------------------------------------------------------------------
# Pallas fused SwiGLU MLP
# ---------------------------------------------------------------------------


def _mlp_cell(xb, gup_ref, gus_ref, dp_ref, ds_ref, nb_in, half_in, n_in, n_sub):
    """One intermediate-column block: gate/up dots + silu*up + down dots.
    xb: [B, n_in] bf16 value. Returns the cell's [B, O] f32 contribution."""
    gate = _gemv_planes(xb, gup_ref[0], gus_ref[0], nb_in, half_in, n_in)
    up = _gemv_planes(xb, gup_ref[1], gus_ref[1], nb_in, half_in, n_in)
    act = (gate * jax.nn.sigmoid(gate) * up).astype(jnp.bfloat16)  # [B, BI]
    part_o = None
    for j in range(n_sub):
        al = act[:, j * 512 : j * 512 + 256]
        ah = act[:, j * 512 + 256 : (j + 1) * 512]
        p = _down_dot(dp_ref[j], al, ah)
        p = p * ds_ref[j, 0][None, :]
        part_o = p if part_o is None else part_o + p
    return part_o


def _mlp_kernel(x_ref, gup_ref, gus_ref, dp_ref, ds_ref, o_ref, acc, *, nb_in, half_in, n_in, n_sub):
    i = pl.program_id(0)
    n_cells = pl.num_programs(0)
    xb = x_ref[:].astype(jnp.bfloat16)
    part_o = _mlp_cell(xb, gup_ref, gus_ref, dp_ref, ds_ref, nb_in, half_in, n_in, n_sub)

    @pl.when(i == 0)
    def _():
        acc[:] = part_o

    @pl.when(i > 0)
    def _():
        acc[:] = acc[:] + part_o

    @pl.when(i == n_cells - 1)
    def _():
        o_ref[:] = acc[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_inter", "interpret"))
def int4_mlp(x, gu_packed, gu_scale, down_packed, down_scale,
             out_dtype=jnp.bfloat16, block_inter: int = 1024, interpret: bool = False):
    """Fused SwiGLU MLP: (silu(x @ Wg) * (x @ Wu)) @ Wd in one pallas_call.

    gu_packed [2, nb, 128, inter_p] / gu_scale [2, nb, inter_p] from
    pack_gate_up_int4; down_packed [inter_p/512, 256, n_out] / down_scale
    [inter_p/512, n_out] from pack_down_int4."""
    B, n_in = x.shape
    two, nb, half_in, inter_p = gu_packed.shape
    assert two == 2 and n_in <= nb * 2 * half_in, (x.shape, gu_packed.shape)
    x = _lane_pad(x, half_in, nb * 2 * half_in)
    n_in = x.shape[-1]
    assert inter_p % MLP_INTER_ALIGN == 0, inter_p
    n_down, half_d, n_out = down_packed.shape
    assert half_d == MLP_INTER_ALIGN // 2 and n_down == inter_p // MLP_INTER_ALIGN, down_packed.shape
    bi = min(block_inter, inter_p)
    assert inter_p % bi == 0 and bi % MLP_INTER_ALIGN == 0, (inter_p, bi)
    n_sub = bi // MLP_INTER_ALIGN
    return pl.pallas_call(
        functools.partial(_mlp_kernel, nb_in=nb, half_in=half_in, n_in=n_in, n_sub=n_sub),
        grid=(inter_p // bi,),
        in_specs=[
            pl.BlockSpec((B, n_in), lambda i: (0, 0)),
            pl.BlockSpec((2, nb, half_in, bi), lambda i: (0, 0, 0, i)),
            pl.BlockSpec((2, nb, bi), lambda i: (0, 0, i)),
            pl.BlockSpec((n_sub, half_d, n_out), lambda i: (i, 0, 0)),
            # scale gets a singleton sublane dim: Pallas requires the last two
            # block dims be 8/128-divisible or full
            pl.BlockSpec((n_sub, 1, n_out), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, n_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_out), out_dtype),
        scratch_shapes=[pltpu.VMEM((B, n_out), jnp.float32)],
        interpret=interpret,
    )(x, gu_packed, gu_scale, down_packed, down_scale[:, None, :])


# ---------------------------------------------------------------------------
# Pallas fused post-attention tail: o_proj + residual + RMSNorm + MLP + residual
# ---------------------------------------------------------------------------


def _o_mlp_kernel(
    attn_ref, xres_ref, nw_ref, op_ref, os_ref, gup_ref, gus_ref, dp_ref, ds_ref,
    o_ref, x2_s, h2_s, acc_s,
    *, nb_o, half_o, n_attn, nb_in, half_in, n_hid, n_sub, eps,
):
    """Grid cell 0: o gemv + residual + norm (stashed in scratch); cells
    1..G: MLP intermediate blocks accumulating into acc_s; last cell adds
    the residual and writes out."""
    i = pl.program_id(0)
    n_cells = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        attn = attn_ref[:].astype(jnp.bfloat16)
        o_out = _gemv_planes(attn, op_ref, os_ref, nb_o, half_o, n_attn)
        x2 = xres_ref[:].astype(jnp.float32) + o_out
        x2_s[:] = x2
        var = jnp.mean(x2 * x2, axis=-1, keepdims=True)
        h2_s[:] = x2 * jax.lax.rsqrt(var + eps) * nw_ref[0][None, :]

    @pl.when(i > 0)
    def _():
        xb = h2_s[:].astype(jnp.bfloat16)
        part_o = _mlp_cell(xb, gup_ref, gus_ref, dp_ref, ds_ref, nb_in, half_in, n_hid, n_sub)
        acc_s[:] = jnp.where(i == 1, part_o, acc_s[:] + part_o)

    @pl.when(i == n_cells - 1)
    def _():
        o_ref[:] = (x2_s[:] + acc_s[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "block_inter", "interpret"))
def int4_o_mlp(
    attn, x_res, norm_w, o_packed, o_scale, gu_packed, gu_scale, down_packed, down_scale,
    eps: float = 1e-6, out_dtype=jnp.bfloat16, block_inter: int = 1024, interpret: bool = False,
):
    """The whole post-attention layer tail in ONE pallas_call:

        x2  = x_res + attn @ Wo
        h2  = rmsnorm(x2) * norm_w
        out = x2 + (silu(h2 @ Wg) * (h2 @ Wu)) @ Wd

    attn: [B, n_attn] pre-o_proj attention output; x_res: [B, n_hid] the
    layer's attention-input residual. All arithmetic between the dots
    (residuals, norm) runs on the VPU — no XLA glue ops."""
    B, n_attn = attn.shape
    n_hid = x_res.shape[-1]
    nb_o, half_o, n_out_o = o_packed.shape
    assert n_out_o == n_hid and n_attn <= nb_o * 2 * half_o
    attn = _lane_pad(attn, half_o, nb_o * 2 * half_o)
    n_attn = attn.shape[-1]
    two, nb, half_in, inter_p = gu_packed.shape
    assert two == 2 and n_hid <= nb * 2 * half_in
    # the MLP reads h2 from scratch sized [B, n_hid]; its half-slices must
    # not overrun, so the Pallas path requires n_hid % half_in == 0 (true
    # for the 896-hidden LM; odd sizes use the XLA reference path)
    assert n_hid % half_in == 0 or n_hid == nb * 2 * half_in, n_hid
    n_down, half_d, n_out = down_packed.shape
    assert n_out == n_hid and half_d == MLP_INTER_ALIGN // 2
    assert n_down == inter_p // MLP_INTER_ALIGN
    bi = min(block_inter, inter_p)
    assert inter_p % bi == 0 and bi % MLP_INTER_ALIGN == 0, (inter_p, bi)
    n_sub = bi // MLP_INTER_ALIGN
    n_cells = 1 + inter_p // bi

    def mlp_i(i):
        return jnp.maximum(i - 1, 0)

    return pl.pallas_call(
        functools.partial(
            _o_mlp_kernel, nb_o=nb_o, half_o=half_o, n_attn=n_attn,
            nb_in=nb, half_in=half_in, n_hid=n_hid, n_sub=n_sub, eps=eps,
        ),
        grid=(n_cells,),
        in_specs=[
            pl.BlockSpec((B, n_attn), lambda i: (0, 0)),
            pl.BlockSpec((B, n_hid), lambda i: (0, 0)),
            pl.BlockSpec((1, n_hid), lambda i: (0, 0)),
            pl.BlockSpec((nb_o, half_o, n_hid), lambda i: (0, 0, 0)),
            pl.BlockSpec((nb_o, n_hid), lambda i: (0, 0)),
            pl.BlockSpec((2, nb, half_in, bi), lambda i: (0, 0, 0, mlp_i(i))),
            pl.BlockSpec((2, nb, bi), lambda i: (0, 0, mlp_i(i))),
            pl.BlockSpec((n_sub, half_d, n_hid), lambda i: (mlp_i(i), 0, 0)),
            pl.BlockSpec((n_sub, 1, n_hid), lambda i: (mlp_i(i), 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, n_hid), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, n_hid), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((B, n_hid), jnp.float32),
            pltpu.VMEM((B, n_hid), jnp.float32),
            pltpu.VMEM((B, n_hid), jnp.float32),
        ],
        interpret=interpret,
    )(attn, x_res, norm_w.reshape(1, n_hid), o_packed, o_scale,
      gu_packed, gu_scale, down_packed, down_scale[:, None, :])
