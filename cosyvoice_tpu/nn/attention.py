"""Multi-head attention with WeNet/ESPnet relative-position support.

Re-derivation of the reference attention (cosyvoice/transformer/attention.py:
26-330) in channel-last JAX. The espnet rel_shift pad-trick is replaced by an
explicit gather — out[i, j] = bd[i, j + T1 - 1 - i] — which is algebraically
identical (see attention.py:225-247) and maps to a single XLA gather.

Masks are bool (True = attend). Fully-masked rows produce zeros (the
reference post-softmax masked_fill, attention.py:113).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30


def masked_softmax(scores: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """scores [B,H,T1,T2]; mask [B,1 or T1,T2] bool or None."""
    if mask is None:
        return jax.nn.softmax(scores, axis=-1)
    m = mask[:, None, :, :]
    attn = jax.nn.softmax(jnp.where(m, scores, NEG_INF), axis=-1)
    return jnp.where(m, attn, 0.0)


class MultiHeadAttention(nn.Module):
    """Absolute-position MHA (query/key/value/out linears, torch-compatible).

    `dtype` selects the matmul compute dtype (params stay fp32; softmax fp32).
    """

    n_head: int
    n_feat: int
    key_bias: bool = True
    dtype: object = None

    def setup(self):
        self.linear_q = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_k = nn.Dense(self.n_feat, use_bias=self.key_bias, dtype=self.dtype)
        self.linear_v = nn.Dense(self.n_feat, dtype=self.dtype)
        self.linear_out = nn.Dense(self.n_feat, dtype=self.dtype)

    def _qkv(self, query, key, value):
        B, T1, _ = query.shape
        T2 = key.shape[1]
        d_k = self.n_feat // self.n_head
        q = self.linear_q(query).reshape(B, T1, self.n_head, d_k).transpose(0, 2, 1, 3)
        k = self.linear_k(key).reshape(B, T2, self.n_head, d_k).transpose(0, 2, 1, 3)
        v = self.linear_v(value).reshape(B, T2, self.n_head, d_k).transpose(0, 2, 1, 3)
        return q, k, v

    def _out(self, attn, v):
        B = v.shape[0]
        x = jnp.einsum("bhts,bhsd->bhtd", attn, v)
        return self.linear_out(x.transpose(0, 2, 1, 3).reshape(B, x.shape[2], self.n_feat))

    def __call__(self, query, key, value, mask=None, pos_emb=None, kv_cache=None):
        """kv_cache: optional (k, v) [B,H,Tc,d] prepended to new keys/values.

        Returns (out [B,T1,C], new_cache (k, v)).
        """
        q, k, v = self._qkv(query, key, value)
        if kv_cache is not None:
            k = jnp.concatenate([kv_cache[0], k], axis=2)
            v = jnp.concatenate([kv_cache[1], v], axis=2)
        d_k = self.n_feat // self.n_head
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k).astype(jnp.float32) / np.sqrt(d_k)
        return self._out(masked_softmax(scores, mask).astype(v.dtype), v), (k, v)


    def attend_chunk(self, query, key, value, k_arena, v_arena, pos, mask):
        """Incremental chunk attention over a fixed KV arena.

        query/key/value: [B, n, C] — the new chunk (tail may be padding;
        padded rows write garbage into the arena at >= pos + real_n, which
        `mask` must exclude and the NEXT chunk's write overwrites).
        k_arena/v_arena: [B, A, C]; new K/V rows are written at [pos, pos+n).
        pos: traced scalar — positions already in the arena.
        mask: [B, n, A] bool (True = attend): key-validity + chunk mask.

        Returns (out [B, n, C], k_arena, v_arena). Bit-equal to the full
        recompute under chunk-causal masks: K/V of a position depend only on
        that position's input, which is unchanged by suffix extension.
        """
        B, n, _ = query.shape
        d_k = self.n_feat // self.n_head
        k_new = self.linear_k(key)
        v_new = self.linear_v(value)
        k_arena = jax.lax.dynamic_update_slice(k_arena, k_new.astype(k_arena.dtype), (0, pos, 0))
        v_arena = jax.lax.dynamic_update_slice(v_arena, v_new.astype(v_arena.dtype), (0, pos, 0))
        A = k_arena.shape[1]
        q = self.linear_q(query).reshape(B, n, self.n_head, d_k)
        k = k_arena.reshape(B, A, self.n_head, d_k).astype(q.dtype)
        v = v_arena.reshape(B, A, self.n_head, d_k)
        scores = jnp.einsum("bnhd,bahd->bhna", q, k).astype(jnp.float32) / np.sqrt(d_k)
        attn = masked_softmax(scores, mask).astype(v.dtype)
        x = jnp.einsum("bhna,bahd->bnhd", attn, v).reshape(B, n, self.n_feat)
        return self.linear_out(x), k_arena, v_arena


class RelPositionMultiHeadAttention(MultiHeadAttention):
    """Transformer-XL style rel-pos MHA with espnet PE table."""

    def setup(self):
        super().setup()
        d_k = self.n_feat // self.n_head
        self.linear_pos = nn.Dense(self.n_feat, use_bias=False, dtype=self.dtype)
        self.pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (self.n_head, d_k))
        self.pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (self.n_head, d_k))

    @staticmethod
    def rel_shift(bd: jax.Array, t2: int) -> jax.Array:
        """bd: [B,H,T1,P] with P = 2*T2-1 -> [B,H,T1,T2], out[i,j]=bd[i, j+T1-1-i].

        Square case uses the espnet zero-pad + reshape trick — pure layout
        ops. The take_along_axis formulation lowers to a TPU gather, which
        measured ~8 ms/layer at T=768 (the flow encoder was 84 ms of the
        118 ms token2wav before this)."""
        B, H, T1, P = bd.shape
        if t2 == T1 and P == 2 * T1 - 1:
            x = jnp.pad(bd, ((0, 0), (0, 0), (0, 0), (1, 0)))  # [B,H,T,2T]
            x = x.reshape(B, H, 2 * T1, T1)[:, :, 1:, :].reshape(B, H, T1, 2 * T1 - 1)
            return x[..., :t2]
        i = jnp.arange(T1)[:, None]
        j = jnp.arange(t2)[None, :]
        idx = j + (T1 - 1 - i)  # [T1, T2]
        return jnp.take_along_axis(bd, jnp.broadcast_to(idx, (B, H, T1, t2)), axis=-1)

    def __call__(self, query, key, value, mask=None, pos_emb=None, kv_cache=None):
        B, T1, _ = query.shape
        d_k = self.n_feat // self.n_head
        q, k, v = self._qkv(query, key, value)
        if kv_cache is not None:
            k = jnp.concatenate([kv_cache[0], k], axis=2)
            v = jnp.concatenate([kv_cache[1], v], axis=2)
        t2 = k.shape[2]

        p = self.linear_pos(pos_emb).reshape(1, -1, self.n_head, d_k).transpose(0, 2, 1, 3)
        q = q.transpose(0, 2, 1, 3)  # [B,T1,H,d]
        q_u = (q + self.pos_bias_u.astype(q.dtype)).transpose(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v.astype(q.dtype)).transpose(0, 2, 1, 3)

        matrix_ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k).astype(jnp.float32)
        matrix_bd = jnp.einsum("bhtd,bhpd->bhtp", q_v, p).astype(jnp.float32)
        if matrix_bd.shape != matrix_ac.shape:
            matrix_bd = self.rel_shift(matrix_bd, t2)
        scores = (matrix_ac + matrix_bd) / np.sqrt(d_k)
        return self._out(masked_softmax(scores, mask).astype(v.dtype), v), (k, v)

    def attend_chunk(self, query, key, value, k_arena, v_arena, pos, mask, pos_emb=None):
        """Chunked rel-pos attention over a fixed KV arena (see base class).

        pos_emb: [1, 2A-1, C] espnet table built for length A (offset 0) —
        table index p corresponds to rel = (A-1) - p, so the bias for query
        at global position pos+i vs key s is row p = (A-1-pos) + (s-i)."""
        B, n, _ = query.shape
        d_k = self.n_feat // self.n_head
        A = k_arena.shape[1]
        k_new = self.linear_k(key)
        v_new = self.linear_v(value)
        k_arena = jax.lax.dynamic_update_slice(k_arena, k_new.astype(k_arena.dtype), (0, pos, 0))
        v_arena = jax.lax.dynamic_update_slice(v_arena, v_new.astype(v_arena.dtype), (0, pos, 0))
        q = self.linear_q(query).reshape(B, n, self.n_head, d_k)
        k = k_arena.reshape(B, A, self.n_head, d_k).astype(q.dtype)
        v = v_arena.reshape(B, A, self.n_head, d_k)
        p = self.linear_pos(pos_emb).reshape(1, -1, self.n_head, d_k)  # [1, 2A-1, H, d]
        q_u = q + self.pos_bias_u.astype(q.dtype)
        q_v = q + self.pos_bias_v.astype(q.dtype)
        matrix_ac = jnp.einsum("bnhd,bahd->bhna", q_u, k).astype(jnp.float32)
        bd_full = jnp.einsum("bnhd,bphd->bhnp", q_v, p.astype(q.dtype)).astype(jnp.float32)
        i = jnp.arange(n)[:, None]
        s = jnp.arange(A)[None, :]
        idx = (A - 1 - pos) + (s - i)  # [n, A]
        matrix_bd = jnp.take_along_axis(
            bd_full, jnp.broadcast_to(idx, (B, self.n_head, n, A)), axis=-1
        )
        scores = (matrix_ac + matrix_bd) / np.sqrt(d_k)
        attn = masked_softmax(scores, mask).astype(v.dtype)
        x = jnp.einsum("bhna,bahd->bnhd", attn, v).reshape(B, n, self.n_feat)
        return self.linear_out(x), k_arena, v_arena
