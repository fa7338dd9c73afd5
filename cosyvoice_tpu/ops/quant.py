"""Weight-only quantization for HBM-bandwidth-bound decode.

The LM decode loop reads ~1 GB of bf16 weights per token block; storing the
matmul kernels as int8 with per-output-channel fp scales halves the HBM
traffic (the role TRT-LLM's int8 weight-only mode plays in the reference
serving stack, runtime/triton_trtllm). XLA:TPU fuses the int8->bf16 upcast
and the scale multiply into the matmul's operand pipeline, so the MXU sees
bf16 while HBM streams int8.

int8 symmetric per-channel scheme: scale_o = max_i |W[i, o]| / 127,
Wq[i, o] = round(W[i, o] / scale_o), dequant = Wq * scale_o.

int4 halves the stored LM weights again (0.25 GB vs 0.5 GB int8 for the
0.5B LM): two input rows pack into one int8 byte (low nibble = rows
[0, in/2), high nibble = rows [in/2, in)), with 8 input-blockwise scale rows
per tensor. int4 is the memory-DENSITY mode (fit more models/KV arena per
chip); int8 remains the decode SPEED mode: on current XLA:TPU the nibble
unpack is not operand-fused into the dot (unlike the int8 convert), so int4
decode measures ~1.1 ms/token vs int8's 0.59 on v5e (bf16 1.27). Variants
measured and rejected: Pallas unpack-in-VMEM kernel (1.03 — per-call launch
overhead, 96 calls/token), concat-then-dot XLA (2.8 — re-materializes
weights every scan step), lax.bitcast_convert_type to native s4 (1.5 —
convert not fused; s4 jit args also crash the axon transfer path).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_tensor(w: np.ndarray, axis: int = -1) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8: returns (w_q int8, scale fp32) with the
    channel axis = `axis` (kept, size preserved in scale via keepdims)."""
    w = np.asarray(w, np.float32)
    red = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    scale = np.max(np.abs(w), axis=red, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12)
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return wq, scale.astype(np.float32)


def dequantize(wq, scale, dtype=jnp.bfloat16):
    return (wq.astype(dtype) * scale.astype(dtype))


def quantize_dense_tree(params, path_pred, dtype=jnp.bfloat16):
    """Walk a flax param pytree; every dict that looks like a Dense kernel
    ({'kernel': [in, out], ...}) whose path satisfies path_pred(path) is
    replaced by {'kernel_q': int8, 'scale': [1, out], (+bias)}.

    Returns the new pytree (numpy leaves for the quantized kernels)."""

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2 and path_pred(path):
                wq, scale = quantize_tensor(np.asarray(node["kernel"]), axis=1)
                out = {"kernel_q": wq, "scale": scale}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


# ---------------------------------------------------------------------------
# int4 weight-only: quarter the bf16 decode HBM traffic.
# ---------------------------------------------------------------------------

INT4_BLOCKS = 8  # scale blocks per tensor (input dim is split into 8 blocks)


def quantize_tensor_int4(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """w: [in, out] -> (packed int8 [in//2, out], scale fp32 [8, out]).

    Symmetric int4 in [-7, 7] with per-(input-block, out-channel) absmax
    scales over INT4_BLOCKS contiguous input blocks. Half-split packing:
    packed[i, o] holds w[i, o] in the low nibble and w[i + in/2, o] in the
    high nibble, so unpacking is two sublane-aligned nibble extracts + one
    concat (no interleave) and each scale block stays a contiguous row range
    of one nibble plane — the whole dequant fuses into the XLA dot."""
    w = np.asarray(w, np.float32)
    n_in, n_out = w.shape
    assert n_in % (2 * INT4_BLOCKS) == 0, n_in
    group = n_in // INT4_BLOCKS
    g = w.reshape(INT4_BLOCKS, group, n_out)
    scale = np.max(np.abs(g), axis=1, keepdims=True) / 7.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(g / scale), -7, 7).astype(np.int8).reshape(n_in, n_out)
    half = n_in // 2
    packed = (q[:half] & 0x0F) | (q[half:] << 4)
    return packed.astype(np.int8), scale[:, 0, :].astype(np.float32)


def unpack_int4(packed, dtype=jnp.bfloat16):
    """packed int8 [in//2, out] -> unpacked [in, out] in `dtype`; low nibble =
    rows [0, in/2), high nibble = rows [in/2, in), sign-extended."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # arithmetic: sign-extends
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=0).astype(dtype)


def int4_matmul(x, packed, scale, dtype=jnp.bfloat16):
    """y = x @ dequant(packed, scale), written so the dequant stays a fused
    producer of the dot on TPU: nibble shifts (int8 elementwise), per-block
    [1, out] scale multiplies, and a static concat — XLA streams only the
    packed bytes from HBM (no materialized [in, out] weight array)."""
    half, n_out = packed.shape
    n_in = 2 * half
    group = n_in // INT4_BLOCKS
    nb2 = INT4_BLOCKS // 2
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # arithmetic: sign-extends
    hi = jnp.right_shift(packed, 4)
    s = scale.astype(dtype)
    xd = x.astype(dtype)
    y = 0
    for b in range(INT4_BLOCKS):  # one dot per scale block, summed
        if b < nb2:  # low nibbles: input rows [0, half)
            wb = lo[b * group : (b + 1) * group]
            xb = xd[..., b * group : (b + 1) * group]
        else:  # high nibbles: input rows [half, in)
            g0 = (b - nb2) * group
            wb = hi[g0 : g0 + group]
            xb = xd[..., half + g0 : half + g0 + group]
        y = y + jnp.dot(xb, wb.astype(dtype) * s[b][None, :])
    return y


def quantize_dense_tree_int4(params, path_pred):
    """Like quantize_dense_tree but int4: kernels become
    {'kernel_q4': int8 [in//2, out], 'scale4': [8, out]}."""

    def walk(node, path):
        if isinstance(node, dict):
            if (
                "kernel" in node
                and getattr(node["kernel"], "ndim", 0) == 2
                and path_pred(path)
                and node["kernel"].shape[0] % (2 * INT4_BLOCKS) == 0
            ):
                wq, scale = quantize_tensor_int4(np.asarray(node["kernel"]))
                out = {"kernel_q4": wq, "scale4": scale}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


# the LM decode path's matmuls (qwen2.py fused layers + the logits head)
QUANT_LM_LAYERS = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj", "llm_decoder")


def quantize_dense_tree_int4p(params, path_pred):
    """Blocked half-split int4 layouts for the fused Pallas decode kernels
    (ops/int4_fused.py): qkv/o -> {kernel_q4b [NB, half, out], scale4
    [NB, out]}; gate_up -> gate|up planes padded to the aligned intermediate;
    down -> 512-row scale blocks over the padded intermediate."""
    from cosyvoice_tpu.ops.int4_fused import (
        pack_down_int4,
        pack_gate_up_int4,
        pack_gemv_int4,
    )

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2 and path_pred(path):
                w = np.asarray(node["kernel"])
                if path[-1] == "gate_up_proj":
                    wq, scale = pack_gate_up_int4(w)
                elif path[-1] == "down_proj":
                    wq, scale = pack_down_int4(w)
                else:
                    wq, scale = pack_gemv_int4(w)
                out = {"kernel_q4b": wq, "scale4": scale}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return walk(params, ())


def quantize_lm_params(params, mode: str = "int8"):
    """fp Qwen2LM param tree -> the tree expected by the quantized module
    (models/qwen2.py QuantDense for int8, QuantDense4 for int4, QuantDense4P
    + the fused-MLP layouts for int4p). In the int4 modes the llm_decoder
    head stays int8 (the head is ~1% of decode bytes and the most
    quantization-sensitive layer)."""
    pred = lambda path: bool(path) and path[-1] in QUANT_LM_LAYERS  # noqa: E731
    if mode in ("int4", "int4p"):
        body = lambda path: pred(path) and path[-1] != "llm_decoder"  # noqa: E731
        if mode == "int4":
            params = quantize_dense_tree_int4(params, body)
        else:
            params = quantize_dense_tree_int4p(params, body)
        return quantize_dense_tree(params, lambda path: bool(path) and path[-1] == "llm_decoder")
    return quantize_dense_tree(params, pred)
