"""Qwen2 transformer backbone in JAX (GQA + RoPE + SwiGLU + RMSNorm).

The speech LM of CosyVoice2/3 wraps HF Qwen2-0.5B as an embeddings-in /
hidden-out encoder (reference: cosyvoice/llm/llm.py:226-254). This is a
TPU-first re-implementation:

- preallocated ring KV cache [L, B, max_len, Hkv, d] updated with
  lax.dynamic_update_slice — no per-step concat, fixed shapes forever
- decode attends to the full arena masked by position < cur_len (one
  fused masked matmul per layer; replaceable by a Pallas kernel)
- bf16 compute / fp32 params + fp32 softmax & norms

Weight layout matches HF Qwen2ForCausalLM module names for checkpoint
conversion (q/k/v/o_proj, gate/up/down_proj, input/post_attention_layernorm).
"""

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.embedding import apply_rope, apply_rope_batched, rope_frequencies


@dataclass(frozen=True)
class Qwen2Config:
    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    vocab_size: int = 151936
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    max_cache_len: int = 4096
    dtype: Any = jnp.bfloat16
    quant: Any = False  # weight-only quant: False | True/"int8" | "int4" (ops/quant.py)
    # int8 KV arena: per-token absmax rows + [.., T] f32 scale planes; halves
    # the arena-read term that dominates batched long-context decode (the
    # cache pytree becomes (k_q, v_q, k_scale, v_scale))
    kv_quant: bool = False
    # sequence-parallel training (GSPMD): PartitionSpec axis names for the
    # [B, T, C] hidden states between layers, e.g. ("dp", "tp", None) shards
    # the sequence over the tp axis (Megatron-SP role — XLA inserts the
    # gather/scatter around attention). Caller must run the step inside
    # jax.sharding.use_mesh(mesh). None = no constraint.
    act_spec: Any = None


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, weight_only: bool = False):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        if weight_only:
            # fused-kernel path (int4p): the caller hands the weight to a
            # Pallas kernel that applies the norm on-chip
            return w
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + self.eps)
        return (x32 * w).astype(x.dtype)


class QuantDense(nn.Module):
    """Weight-only int8 Dense: kernel stored int8 + per-out-channel fp32
    scale; HBM streams int8, XLA fuses the upcast+scale into the matmul
    (the TRT-LLM int8 weight-only role). Populate params with
    ops.quant.quantize_dense_tree."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kq = self.param("kernel_q", nn.initializers.zeros, (in_f, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones, (1, self.features), jnp.float32)
        y = jnp.dot(x.astype(self.dtype), kq.astype(self.dtype)) * scale.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


class QuantDense4(nn.Module):
    """Weight-only int4 Dense: half-split nibble-packed kernel + 8
    input-blockwise fp32 scale rows (ops/quant.py quantize_tensor_int4, the
    TRT-LLM int4 weight-only role). Halves stored weight bytes vs int8 —
    the memory-density mode; int8 (QuantDense) is the decode-speed mode
    (see ops/quant.py module docstring for the measured tradeoffs)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from cosyvoice_tpu.ops.quant import INT4_BLOCKS, int4_matmul

        in_f = x.shape[-1]
        kq = self.param("kernel_q4", nn.initializers.zeros, (in_f // 2, self.features), jnp.int8)
        scale = self.param("scale4", nn.initializers.ones, (INT4_BLOCKS, self.features), jnp.float32)
        y = int4_matmul(x, kq, scale, self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


def _int4p_use_pallas(rows: int, n_in: int, n_out: int = 0) -> bool:
    import os

    if rows > 16 or n_in % 128 != 0 or os.environ.get("COSY_INT4_PALLAS", "1") == "0":
        return False
    # int4_gemv's out-grid blocks are 128-lane multiples (_pick_bo); a
    # non-multiple out dim (e.g. a head config where (nh+2*nkv)*hd % 128 != 0)
    # must take the XLA blocked-matmul path instead of tripping the assert
    if n_out % 128 != 0:
        return False
    # the computation must actually land on TPU: under init_on_cpu() (a
    # jax.default_device(cpu) context) default_backend still reports the
    # accelerator, but tracing a Pallas call for the CPU device crashes
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None and getattr(dev, "platform", "tpu") != "tpu":
        return False
    return jax.default_backend() == "tpu"


class QuantDense4P(nn.Module):
    """int4 Dense in the BLOCKED half-split layout served by the fused Pallas
    decode kernels (ops/int4_fused.py): kernel [NB, half, out] + scale
    [NB, out]. Decode-shaped calls (<=16 rows on TPU) hit the int4_gemv
    Pallas kernel; prefill/CPU fall back to the XLA blocked matmul."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from cosyvoice_tpu.ops.int4_fused import (
            GEMV_IN_ALIGN,
            _pad_to,
            int4_gemv,
            int4_matmul_blocked,
        )

        in_f = x.shape[-1]
        nb = _pad_to(in_f, GEMV_IN_ALIGN) // GEMV_IN_ALIGN
        kq = self.param(
            "kernel_q4b", nn.initializers.zeros, (nb, GEMV_IN_ALIGN // 2, self.features), jnp.int8
        )
        scale = self.param("scale4", nn.initializers.ones, (nb, self.features), jnp.float32)
        lead = x.shape[:-1]
        rows = int(np.prod(lead))
        if _int4p_use_pallas(rows, in_f, self.features):
            y = int4_gemv(x.reshape(rows, in_f), kq, scale, out_dtype=self.dtype).reshape(
                *lead, self.features
            )
        else:
            y = int4_matmul_blocked(x, kq, scale, self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


def dense_cls(cfg: Qwen2Config):
    """Dense flavor for the decode-path matmuls given cfg.quant."""
    if cfg.quant == "int4":
        return QuantDense4
    if cfg.quant == "int4p":
        return QuantDense4P
    return QuantDense if cfg.quant else nn.Dense


class _Int4PWeights(nn.Module):
    """Param holder for the fused-MLP int4p layouts (returns raw arrays so
    the parent can hand them to one fused Pallas kernel)."""

    wshape: tuple
    sshape: tuple

    @nn.compact
    def __call__(self):
        kq = self.param("kernel_q4b", nn.initializers.zeros, self.wshape, jnp.int8)
        scale = self.param("scale4", nn.initializers.ones, self.sshape, jnp.float32)
        return kq, scale


class Qwen2Attention(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, cos, sin, mask_bias, kv_write_pos=None, cache=None, raw_out: bool = False):
        """x: [B, S, C]; cos/sin: [S, d/2] rope slices for these positions;
        mask_bias: [B, 1, S, T] additive; cache: optional (k, v) each
        [B, max_len, Hkv, d] with kv_write_pos scalar -> returns updated.
        raw_out (int4p only): return the PRE-o_proj attention output plus
        the o_proj weights for the fused layer-tail kernel.
        """
        c = self.cfg
        B, S, _ = x.shape
        # fused qkv: one [C, (H+2Hkv)*d] matmul per step instead of three —
        # the decode hot loop is HBM-bound, fusing keeps the MXU streaming.
        # (converter note: concat HF q_proj|k_proj|v_proj along out dim.)
        nq = c.num_heads * c.head_dim
        nkv = c.num_kv_heads * c.head_dim
        D = dense_cls(c)
        qkv = D(nq + 2 * nkv, dtype=c.dtype, name="qkv_proj")(x)
        q, k, v = qkv[..., :nq], qkv[..., nq : nq + nkv], qkv[..., nq + nkv :]
        q = q.reshape(B, S, c.num_heads, c.head_dim)
        k = k.reshape(B, S, c.num_kv_heads, c.head_dim)
        v = v.reshape(B, S, c.num_kv_heads, c.head_dim)
        if jnp.ndim(cos) == 3:
            # ragged batch: per-row positions (continuous batching)
            q = apply_rope_batched(q, cos, sin)
            k = apply_rope_batched(k, cos, sin)
        else:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        kv_quant = cache is not None and len(cache) == 4
        if kv_quant:
            # int8 KV arena: quantize the new rows (per-token absmax) before
            # the write; scales live in flat [B, T] f32 planes
            from cosyvoice_tpu.ops.decode_attention import quantize_kv_rows

            ck, cv, cks, cvs = cache
            k_w, ks_new = quantize_kv_rows(k)
            v_w, vs_new = quantize_kv_rows(v)
        elif cache is not None:
            ck, cv = cache
            k_w, v_w = k, v
        if cache is not None:
            if jnp.ndim(kv_write_pos) == 0:
                ck = jax.lax.dynamic_update_slice(ck, k_w.astype(ck.dtype), (0, kv_write_pos, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v_w.astype(cv.dtype), (0, kv_write_pos, 0, 0))
                if kv_quant:
                    cks = jax.lax.dynamic_update_slice(cks, ks_new, (0, kv_write_pos))
                    cvs = jax.lax.dynamic_update_slice(cvs, vs_new, (0, kv_write_pos))
            else:
                # per-row write position (S == 1, continuous batching)
                import os

                from cosyvoice_tpu.ops.decode_attention import _kv_group

                impl = os.environ.get("COSY_KV_WRITE", "auto")
                if impl != "select" and (
                    jax.default_backend() == "tpu"
                    and c.num_kv_heads * c.head_dim % 128 == 0
                    and ck.shape[1] % _kv_group(ck.dtype) == 0
                ):
                    # Pallas row write: touches one tile-group of rows per
                    # batch row instead of rewriting the whole arena
                    # (ops/decode_attention)
                    from cosyvoice_tpu.ops.decode_attention import kv_arena_write_traced

                    ck = kv_arena_write_traced(ck, k_w, kv_write_pos)
                    cv = kv_arena_write_traced(cv, v_w, kv_write_pos)
                else:
                    # fallback: masked select (full-arena rewrite, fuses on
                    # any backend; fine for tests / CPU mesh)
                    kpos = jnp.arange(ck.shape[1])
                    sel = (kpos[None, :] == kv_write_pos[:, None])[:, :, None, None]
                    ck = jnp.where(sel, k_w.astype(ck.dtype), ck)
                    cv = jnp.where(sel, v_w.astype(cv.dtype), cv)
                if kv_quant:
                    # the scale planes are tiny ([B, T] f32) — masked select
                    spos = jnp.arange(cks.shape[1])
                    ssel = spos[None, :] == kv_write_pos[:, None]
                    cks = jnp.where(ssel, ks_new, cks)
                    cvs = jnp.where(ssel, vs_new, cvs)
            k_all, v_all = ck, cv
            new_cache = (ck, cv, cks, cvs) if kv_quant else (ck, cv)
        else:
            k_all, v_all = k, v
            new_cache = None

        out = None
        if cache is not None and S == 1:
            # decode step: route through the Pallas flash-decode kernel when
            # eligible — HBM reads proportional to the LIVE sequence length
            # (ceil((cur+1)/BLK) blocks) instead of streaming the full arena
            # through the masked einsum every step (ops/decode_attention.py)
            from cosyvoice_tpu.ops.decode_attention import (
                flash_decode_wanted,
                gqa_decode_attention,
                gqa_decode_attention_quant,
            )

            interp = flash_decode_wanted(k_all.shape[1], c.num_kv_heads * c.head_dim)
            if interp is not None:
                cur = (
                    jnp.broadcast_to(kv_write_pos, (B,))
                    if jnp.ndim(kv_write_pos) == 0
                    else kv_write_pos
                )
                if kv_quant:
                    out = gqa_decode_attention_quant(
                        q[:, 0], k_all, v_all, cks, cvs, cur, interpret=interp
                    )
                else:
                    out = gqa_decode_attention(q[:, 0], k_all, v_all, cur, interpret=interp)
                out = out.reshape(B, S, c.num_heads * c.head_dim)
        if out is None:
            if kv_quant:
                # prefill / CPU fallback: the upcast+scale fuses into the
                # attention einsum's arena read
                from cosyvoice_tpu.ops.decode_attention import dequantize_kv_arena

                k_all = dequantize_kv_arena(k_all, cks, c.dtype)
                v_all = dequantize_kv_arena(v_all, cvs, c.dtype)
            # GQA via grouped einsum — never materializes the head-repeated KV
            # (a 7x HBM blowup per decode step with repeat)
            rep = c.num_heads // c.num_kv_heads
            qg = q.reshape(B, S, c.num_kv_heads, rep, c.head_dim)
            scores = jnp.einsum("bsgrd,btgd->bgrst", qg, k_all).astype(jnp.float32) / np.sqrt(c.head_dim)
            scores = scores + mask_bias[:, None]  # bias [B,1,S,T] -> [B,1,1,S,T]
            attn = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
            out = jnp.einsum("bgrst,btgd->bsgrd", attn, v_all).reshape(B, S, c.num_heads * c.head_dim)
        if c.quant == "int4p":
            from cosyvoice_tpu.ops.int4_fused import (
                GEMV_IN_ALIGN,
                _pad_to,
                int4_gemv,
                int4_matmul_blocked,
            )

            nb_o = _pad_to(nq, GEMV_IN_ALIGN) // GEMV_IN_ALIGN
            o_p, o_s = _Int4PWeights(
                (nb_o, GEMV_IN_ALIGN // 2, c.hidden_size), (nb_o, c.hidden_size), name="o_proj"
            )()
            if raw_out:
                # fused-tail path: the layer hands (pre-o attention, o
                # weights) to ONE Pallas kernel with the norm + MLP
                return (out, o_p, o_s), new_cache
            if _int4p_use_pallas(B * S, nq, c.hidden_size):
                out = int4_gemv(out.reshape(B * S, nq), o_p, o_s, out_dtype=c.dtype).reshape(
                    B, S, c.hidden_size
                )
            else:
                out = int4_matmul_blocked(out, o_p, o_s, c.dtype)
            return out, new_cache
        out = D(c.hidden_size, use_bias=False, dtype=c.dtype, name="o_proj")(out)
        return out, new_cache


class Qwen2MLP(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, fused_tail=None):
        c = self.cfg
        if c.quant == "int4p":
            from cosyvoice_tpu.ops.int4_fused import (
                GEMV_IN_ALIGN,
                _pad_to,
                MLP_INTER_ALIGN,
                int4_mlp,
                int4_mlp_reference,
            )

            nb_in = _pad_to(c.hidden_size, GEMV_IN_ALIGN) // GEMV_IN_ALIGN
            half_in = GEMV_IN_ALIGN // 2
            inter_p = _pad_to(c.intermediate_size, MLP_INTER_ALIGN)
            gup, gus = _Int4PWeights(
                (2, nb_in, half_in, inter_p), (2, nb_in, inter_p), name="gate_up_proj"
            )()
            dp, ds = _Int4PWeights(
                (inter_p // MLP_INTER_ALIGN, MLP_INTER_ALIGN // 2, c.hidden_size),
                (inter_p // MLP_INTER_ALIGN, c.hidden_size),
                name="down_proj",
            )()
            if fused_tail is not None:
                # ONE Pallas call for the whole post-attention tail:
                # x is the PRE-o_proj attention output here
                from cosyvoice_tpu.ops.int4_fused import int4_o_mlp

                x_res, norm_w, o_p, o_s = fused_tail
                B, S, n_attn = x.shape
                y = int4_o_mlp(
                    x.reshape(B * S, n_attn), x_res.reshape(B * S, c.hidden_size),
                    norm_w, o_p, o_s, gup, gus, dp, ds,
                    eps=c.rms_norm_eps, out_dtype=c.dtype,
                )
                return y.reshape(B, S, c.hidden_size)
            lead = x.shape[:-1]
            rows = int(np.prod(lead))
            if _int4p_use_pallas(rows, c.hidden_size):
                y = int4_mlp(x.reshape(rows, c.hidden_size), gup, gus, dp, ds, out_dtype=c.dtype)
            else:
                y = int4_mlp_reference(x.reshape(rows, c.hidden_size), gup, gus, dp, ds, c.dtype)
            return y.reshape(*lead, c.hidden_size)
        D = dense_cls(c)
        # fused gate|up (converter note: concat HF gate_proj|up_proj)
        gu = D(2 * c.intermediate_size, use_bias=False, dtype=c.dtype, name="gate_up_proj")(x)
        gate, up = jnp.split(gu, 2, axis=-1)
        return D(c.hidden_size, use_bias=False, dtype=c.dtype, name="down_proj")(jax.nn.silu(gate) * up)


class Qwen2Layer(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, cos, sin, mask_bias, kv_write_pos=None, cache=None):
        c = self.cfg
        fused_tail = (
            c.quant == "int4p"
            and x.shape[1] == 1
            and c.hidden_size % 128 == 0
            and _int4p_use_pallas(x.shape[0], c.hidden_size)
        )
        h = RMSNorm(c.rms_norm_eps, name="input_layernorm")(x)
        attn = Qwen2Attention(c, name="self_attn")
        if fused_tail:
            # decode fast path: attention returns its PRE-o output + o
            # weights; o_proj + residual + norm2 + MLP + residual run in one
            # Pallas kernel (no XLA glue ops between — measured dominant)
            (attn_raw, o_p, o_s), new_cache = attn(
                h, cos, sin, mask_bias, kv_write_pos, cache, raw_out=True
            )
            nw2 = RMSNorm(c.rms_norm_eps, name="post_attention_layernorm")(x, weight_only=True)
            x = Qwen2MLP(c, name="mlp")(attn_raw, fused_tail=(x, nw2, o_p, o_s))
            return x, new_cache
        attn_out, new_cache = attn(h, cos, sin, mask_bias, kv_write_pos, cache)
        x = x + attn_out
        h = RMSNorm(c.rms_norm_eps, name="post_attention_layernorm")(x)
        x = x + Qwen2MLP(c, name="mlp")(h)
        return x, new_cache


class Qwen2Model(nn.Module):
    """Backbone: embeds in, final hidden out. Text embedding table exposed via
    `embed_tokens` for the LM's text side."""

    cfg: Qwen2Config

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype)
        self.layers = [Qwen2Layer(c, name=f"layers_{i}") for i in range(c.num_layers)]
        self.norm = RMSNorm(c.rms_norm_eps)

    def embed_text(self, token_ids):
        return self.embed_tokens(token_ids)

    def final_norm(self, x):
        """Expose the final RMSNorm for callers that run the layer stack
        externally (the fused whole-step decode kernel)."""
        return self.norm(x)

    def _rope(self):
        c = self.cfg
        return rope_frequencies(c.head_dim, c.max_cache_len, c.rope_theta)

    def __call__(self, embeds, attn_mask):
        """Full (training) forward. embeds: [B, T, C]; attn_mask: [B, T] bool
        valid mask. Causal masking applied internally. Returns hidden [B,T,C].
        """
        B, T, _ = embeds.shape
        causal = jnp.tril(jnp.ones((T, T), bool))
        mask = causal[None, :, :] & attn_mask[:, None, :]
        bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)[:, None, :, :]
        rc, rs = self._rope()
        cos, sin = rc[:T], rs[:T]
        x = embeds.astype(self.cfg.dtype)
        for layer in self.layers:
            x, _ = layer(x, cos, sin, bias)
            if self.cfg.act_spec is not None:
                from jax.sharding import PartitionSpec

                try:
                    x = jax.lax.with_sharding_constraint(x, PartitionSpec(*self.cfg.act_spec))
                except RuntimeError:
                    pass  # no mesh in context (param init / single-device runs)
        return self.norm(x)

    def prefill(self, embeds, true_len, cache):
        """Write the prompt into the KV arena. embeds: [B, S, C] tail-padded;
        true_len: [B] actual lengths. Returns (hidden_last [B, C], cache).

        hidden_last is the hidden state at position true_len-1.
        """
        B, S, _ = embeds.shape
        qpos = jnp.arange(S)
        kpos = jnp.arange(cache[0].shape[2])  # arena length (may be a bucket < max_cache_len)
        causal = kpos[None, None, :] <= qpos[None, :, None]  # [1, S, K]
        valid = kpos[None, None, :] < true_len[:, None, None]  # [B, 1, K]
        bias = jnp.where(causal & valid, 0.0, -1e30).astype(jnp.float32)[:, None, :, :]
        rc, rs = self._rope()
        cos, sin = rc[:S], rs[:S]
        x = embeds.astype(self.cfg.dtype)
        new_cache = []
        for i, layer in enumerate(self.layers):
            x, layer_cache = layer(x, cos, sin, bias, 0, tuple(part[i] for part in cache))
            new_cache.append(layer_cache)
        x = self.norm(x)
        idx = jnp.clip(true_len - 1, 0)
        hidden_last = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        stacked_cache = tuple(jnp.stack(parts) for parts in zip(*new_cache))
        return hidden_last, stacked_cache

    def extend(self, embeds, start, cache):
        """Append a fully-valid segment at position `start` (bistream feeds:
        text blocks, task id, prompt-speech blocks — llm.py:593-644).

        embeds: [B, S, C] exact-shape segment; start: [B] current length.
        Returns (hidden_last [B, C], cache)."""
        B, S, _ = embeds.shape
        c = self.cfg
        rc, rs = self._rope()
        cos = jax.lax.dynamic_slice_in_dim(rc, start[0], S, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(rs, start[0], S, axis=0)
        kpos = jnp.arange(cache[0].shape[2])
        qpos = start[:, None] + jnp.arange(S)[None, :]  # [B, S] global positions
        visible = kpos[None, None, :] <= qpos[:, :, None]  # [B, S, K]
        bias = jnp.where(visible, 0.0, -1e30).astype(jnp.float32)[:, None, :, :]
        x = embeds.astype(c.dtype)
        new_cache = []
        for i, layer in enumerate(self.layers):
            x, layer_cache = layer(x, cos, sin, bias, start[0], tuple(part[i] for part in cache))
            new_cache.append(layer_cache)
        x = self.norm(x)
        stacked_cache = tuple(jnp.stack(parts) for parts in zip(*new_cache))
        return x[:, -1], stacked_cache

    def decode_step(self, emb, cur_len, cache):
        """One-token step. emb: [B, 1, C]; cur_len: [B] current sequence
        lengths (kv write position). Returns (hidden [B, C], cache)."""
        B = emb.shape[0]
        c = self.cfg
        # rope for position cur_len (assume uniform batch position offsets)
        rc, rs = self._rope()
        cos = jax.lax.dynamic_slice_in_dim(rc, cur_len[0], 1, axis=0)
        sin = jax.lax.dynamic_slice_in_dim(rs, cur_len[0], 1, axis=0)
        key_pos = jnp.arange(cache[0].shape[2])
        valid = key_pos[None, :] <= cur_len[:, None]  # keys 0..cur_len inclusive (self)
        bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
        x = emb.astype(c.dtype)
        new_cache = []
        for i, layer in enumerate(self.layers):
            x, layer_cache = layer(x, cos, sin, bias, cur_len[0], tuple(part[i] for part in cache))
            new_cache.append(layer_cache)
        x = self.norm(x)
        stacked_cache = tuple(jnp.stack(parts) for parts in zip(*new_cache))
        return x[:, 0], stacked_cache

    def decode_step_ragged(self, emb, cur_len, cache):
        """One-token step with PER-ROW positions (continuous batching: slots
        hold sequences of different lengths). Rope is gathered at each row's
        own position and the KV arena is written per row; `decode_step`'s
        uniform-position fast path assumes cur_len is identical across the
        batch and is kept for the single-session engines."""
        B = emb.shape[0]
        c = self.cfg
        rc, rs = self._rope()
        cos = rc[cur_len][:, None, :]  # [B, 1, d/2]
        sin = rs[cur_len][:, None, :]
        key_pos = jnp.arange(cache[0].shape[2])
        valid = key_pos[None, :] <= cur_len[:, None]
        bias = jnp.where(valid, 0.0, -1e30).astype(jnp.float32)[:, None, None, :]
        x = emb.astype(c.dtype)
        new_cache = []
        for i, layer in enumerate(self.layers):
            x, layer_cache = layer(x, cos, sin, bias, cur_len, tuple(part[i] for part in cache))
            new_cache.append(layer_cache)
        x = self.norm(x)
        stacked_cache = tuple(jnp.stack(parts) for parts in zip(*new_cache))
        return x[:, 0], stacked_cache

    def init_cache(self, batch: int, dtype=None, length=None):
        c = self.cfg
        T = length or c.max_cache_len
        shape = (c.num_layers, batch, T, c.num_kv_heads, c.head_dim)
        if c.kv_quant:
            sshape = (c.num_layers, batch, T)
            return (
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(sshape, jnp.float32),
                jnp.zeros(sshape, jnp.float32),
            )
        dtype = dtype or c.dtype
        return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
