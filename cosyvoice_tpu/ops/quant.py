"""Weight-only int8 quantization for HBM-bandwidth-bound decode.

The LM decode loop reads ~1 GB of bf16 weights per token block; storing the
matmul kernels as int8 with per-output-channel fp scales halves the HBM
traffic (the role TRT-LLM's int8 weight-only mode plays in the reference
serving stack, runtime/triton_trtllm). XLA:TPU fuses the int8->bf16 upcast
and the scale multiply into the matmul's operand pipeline, so the MXU sees
bf16 while HBM streams int8.

Symmetric per-channel scheme: scale_o = max_i |W[i, o]| / 127,
Wq[i, o] = round(W[i, o] / scale_o), dequant = Wq * scale_o.
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


# the LM decode path's matmuls (qwen2.py fused layers + the logits head)
QUANT_LM_LAYERS = ("qkv_proj", "o_proj", "gate_up_proj", "down_proj", "llm_decoder")


def quantize_lm_params(params):
    """fp Qwen2LM param tree -> the tree expected by the quant=True module
    (models/qwen2.py QuantDense)."""
    return quantize_dense_tree(params, lambda path: bool(path) and path[-1] in QUANT_LM_LAYERS)
