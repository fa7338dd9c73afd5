"""Flow acoustic model: speech tokens -> mel, via upsample-conformer + CFM.

TPU re-design of cosyvoice/flow/flow.py:149-281 (CausalMaskedDiffWithXvec,
the CosyVoice2 flow). The torch module tree is split into two functional
parts with separate param trees:

- `FlowEncoder` (linen): token embedding -> upsample conformer -> mu
- `ConditionalDecoder` estimator driven by the pure `solve_euler` scan

`CausalFlow` orchestrates them. All inference entry points take concrete
(optionally tail-padded) arrays plus true lengths; padding is numerics-neutral
(masked attention + LayerNorm-only blocks), so the engine can bucket lengths
to bound XLA recompilation.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.flow_decoder import ConditionalDecoder, EstimatorConfig
from cosyvoice_tpu.models.flow_matching import (
    CFMConfig,
    cfm_loss,
    fixed_noise_buffer,
    solve_euler,
    solve_euler_chunk,
)
from cosyvoice_tpu.nn.conformer import UpsampleConformerEncoder
from cosyvoice_tpu.ops.masks import make_non_pad_mask


@dataclass(frozen=True)
class FlowConfig:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    input_frame_rate: int = 25
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    chunk_size: int = 25  # streaming chunk, tokens
    # encoder dims (upsample-conformer variant)
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    # v3 DiT variant
    encoder_type: str = "upsample_conformer"  # or "dit_prelookahead"
    estimator_type: str = "unet"  # or "dit"
    dit_lookahead_channels: int = 1024
    dtype: object = None  # bf16 compute for encoder attention/FFN
    estimator: EstimatorConfig = field(default_factory=EstimatorConfig)
    dit: Optional[object] = None  # DiTConfig when estimator_type == "dit"
    cfm: CFMConfig = field(default_factory=CFMConfig)


class FlowEncoder(nn.Module):
    """Embedding + spk projection + upsample conformer + mel projection."""

    cfg: FlowConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size)
        self.spk_embed_affine_layer = nn.Dense(c.output_size)
        self.encoder = UpsampleConformerEncoder(
            output_size=c.input_size,
            attention_heads=c.attention_heads,
            linear_units=c.linear_units,
            num_blocks=c.num_blocks,
            num_up_blocks=c.num_up_blocks,
            static_chunk_size=c.chunk_size,
            pre_lookahead_len=c.pre_lookahead_len,
            up_stride=c.token_mel_ratio,
            dtype=c.dtype,
        )
        self.encoder_proj = nn.Dense(c.output_size)

    def init_all(self, token, token_len, embedding):
        """Trace every submodule once so init() materializes all params."""
        mu, mask = self(token, token_len)
        return mu, mask, self.project_spk(embedding)

    def project_spk(self, embedding: jax.Array) -> jax.Array:
        """l2-normalize the x-vector then project 192 -> 80 (flow.py:248-249)."""
        embedding = embedding / (jnp.linalg.norm(embedding, axis=-1, keepdims=True) + 1e-12)
        return self.spk_embed_affine_layer(embedding)

    def __call__(
        self,
        token: jax.Array,
        token_len: jax.Array,
        context_token: Optional[jax.Array] = None,
        streaming: bool = False,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """token: [B, L] int32 body tokens (tail-padded ok, true length in
        token_len). context_token: [B, pre_lookahead_len] future tokens when
        not finalizing (None => zero-padded lookahead, i.e. finalize).
        Returns (mu [B, L*r, 80], mel pad mask [B, L*r])."""
        L = token.shape[1]
        mask = make_non_pad_mask(token_len, L)
        emb = self.input_embedding(jnp.clip(token, 0)) * mask[..., None]
        context = None
        if context_token is not None:
            context = self.input_embedding(jnp.clip(context_token, 0))
        h, mel_mask = self.encoder(emb, token_len, context=context, streaming=streaming, deterministic=deterministic)
        return self.encoder_proj(h), mel_mask

    def forward_chunk(self, token, context_token, enc_state, pos, real_n):
        """Incremental encoder chunk: token [B, n] (tail beyond real_n is
        padding), context_token [B, la] or None (finalize). Returns
        (mu [B, n*r, 80], new enc_state)."""
        n = token.shape[1]
        valid = jnp.arange(n)[None, :] < real_n
        emb = self.input_embedding(jnp.clip(token, 0)) * valid[..., None]
        context = None
        if context_token is not None:
            context = self.input_embedding(jnp.clip(context_token, 0))
        h, enc_state = self.encoder.forward_chunk(emb, context, enc_state, pos, real_n)
        return self.encoder_proj(h), enc_state


class DiTFlowEncoder(nn.Module):
    """CosyVoice3 flow front-end (flow.py:284-414): token embedding (80-d) ->
    PreLookaheadLayer -> repeat_interleave(token_mel_ratio). No conformer."""

    cfg: "FlowConfig"

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size)
        self.spk_embed_affine_layer = nn.Dense(c.output_size)
        from cosyvoice_tpu.nn.conformer import PreLookaheadLayer

        self.pre_lookahead_layer = PreLookaheadLayer(c.dit_lookahead_channels, c.pre_lookahead_len)

    def init_all(self, token, token_len, embedding):
        mu, mask = self(token, token_len)
        return mu, mask, self.project_spk(embedding)

    def project_spk(self, embedding: jax.Array) -> jax.Array:
        embedding = embedding / (jnp.linalg.norm(embedding, axis=-1, keepdims=True) + 1e-12)
        return self.spk_embed_affine_layer(embedding)

    def __call__(self, token, token_len, context_token=None, streaming=False, deterministic=True):
        c = self.cfg
        L = token.shape[1]
        mask = make_non_pad_mask(token_len, L)
        emb = self.input_embedding(jnp.clip(token, 0)) * mask[..., None]
        if context_token is not None:
            ctx = self.input_embedding(jnp.clip(context_token, 0))
            # per-row scatter at each row's true boundary (vmapped: a single
            # dynamic_update_slice at token_len[0] would place every row's
            # lookahead context at row 0's length)
            emb = jax.vmap(
                lambda e, x, start: jax.lax.dynamic_update_slice(e, x, (start, 0))
            )(emb, ctx.astype(emb.dtype), token_len)
        h = self.pre_lookahead_layer(emb)
        h = jnp.repeat(h, c.token_mel_ratio, axis=1)
        mel_mask = jnp.repeat(mask, c.token_mel_ratio, axis=1)
        return h, mel_mask

    def forward_chunk(self, token, context_token, enc_state, pos, real_n):
        """Incremental encoder chunk (v3: lookahead conv + repeat, no
        attention — only the conv2 cache carries between chunks)."""
        c = self.cfg
        n = token.shape[1]
        valid = jnp.arange(n)[None, :] < real_n
        emb = self.input_embedding(jnp.clip(token, 0)) * valid[..., None]
        ctx = None
        if context_token is not None:
            ctx = self.input_embedding(jnp.clip(context_token, 0))
        st = dict(enc_state)
        h, st["pre_conv2"] = self.pre_lookahead_layer(emb, ctx, st["pre_conv2"], real_n)
        return jnp.repeat(h, c.token_mel_ratio, axis=1), st


class CausalFlow:
    """CosyVoice2/3-style causal flow model (functional orchestrator)."""

    def __init__(self, cfg: FlowConfig = FlowConfig()):
        self.cfg = cfg
        if cfg.encoder_type == "dit_prelookahead":
            self.encoder = DiTFlowEncoder(cfg)
        else:
            self.encoder = FlowEncoder(cfg)
        if cfg.estimator_type == "dit":
            from cosyvoice_tpu.models.dit import DiTConfig, DiTEstimator

            self.estimator = DiTEstimator(cfg.dit or DiTConfig(static_chunk_size=cfg.chunk_size * cfg.token_mel_ratio))
        else:
            self.estimator = ConditionalDecoder(cfg.estimator)

    # ---------------- init ----------------
    def init(self, rng: jax.Array) -> dict:
        from cosyvoice_tpu.utils.devices import jit_init

        k1, k2 = jax.random.split(rng)
        tok = jnp.zeros((1, 2 * self.cfg.chunk_size), jnp.int32)
        enc_params = jit_init(
            self.encoder.init,
            k1, tok, jnp.asarray([tok.shape[1]]), jnp.zeros((1, self.cfg.spk_embed_dim)), method="init_all"
        )
        T = tok.shape[1] * self.cfg.token_mel_ratio
        est_params = jit_init(
            self.estimator.init,
            k2,
            jnp.zeros((1, T, 80)),
            jnp.ones((1, T)),
            jnp.zeros((1, T, 80)),
            jnp.zeros((1,)),
            jnp.zeros((1, 80)),
            jnp.zeros((1, T, 80)),
        )
        return {"encoder": enc_params, "estimator": est_params}

    def _estimator_apply(self, params, x, mask, mu, t, spks, cond, streaming):
        return self.estimator.apply(params, x, mask, mu, t, spks, cond, streaming)

    # ---------------- inference ----------------
    def inference(
        self,
        params: dict,
        token: jax.Array,
        token_len: jax.Array,
        conds: jax.Array,
        embedding: jax.Array,
        context_token: Optional[jax.Array] = None,
        streaming: bool = False,
        temperature: float = 1.0,
    ) -> jax.Array:
        """token: [1, L] prompt+generated BODY tokens, zero tail-padded with
        true length in token_len (ensure L >= token_len + lookahead when
        passing context). context_token: [1, pre_lookahead_len] future tokens
        when not finalizing. conds: [1, L*r, 80] prompt mel at the front.
        embedding: [1, 192] raw x-vector.

        Returns mel [1, L*r, 80] (frames beyond r*token_len are zeros);
        the engine slices out [prompt_mel_len : r*token_len).
        """
        c = self.cfg
        mu, mel_mask = self.encoder.apply(
            params["encoder"], token, token_len, context_token, streaming=streaming
        )
        spks = self.encoder.apply(params["encoder"], embedding, method="project_spk")
        T = mu.shape[1]
        z = jnp.asarray(fixed_noise_buffer()[None, :T]) * temperature
        mask_f = mel_mask.astype(mu.dtype)
        mel = solve_euler(
            self._estimator_apply,
            params["estimator"],
            z,
            mu,
            mask_f,
            spks,
            conds,
            c.cfm,
            streaming=streaming,
        )
        return mel * mask_f[..., None]

    # ---------------- incremental streaming (SURVEY §5.7 re-design) ----------------
    def stream_state(self, B: int = 1, arena_tok: int = 256):
        """Zero carried state for chunked incremental inference: encoder KV
        arenas + conv caches, and per-Euler-step estimator caches (stacked
        [n_timesteps] for the solver scan). Replaces the reference's
        full-prefix recompute (cli/model.py:294-303): each chunk costs
        O(chunk * prefix) attention instead of O(prefix^2)."""
        from cosyvoice_tpu.models.flow_decoder import estimator_stream_state

        c = self.cfg
        arena_mel = arena_tok * c.token_mel_ratio
        kv_dtype = c.dtype or jnp.float32
        C = c.input_size
        if c.estimator_type == "dit":
            from cosyvoice_tpu.models.dit import dit_stream_state

            enc = {"pre_conv2": jnp.zeros((B, 2, c.dit_lookahead_channels))}
            est1 = dit_stream_state(self.estimator.cfg, 2 * B, arena_mel)
        else:
            enc = {
                "pre_conv2": jnp.zeros((B, 2, C)),
                "up_conv": jnp.zeros((B, c.token_mel_ratio * 2, C)),
            }
            for i in range(c.num_blocks):
                enc[f"enc_{i}"] = (jnp.zeros((B, arena_tok, C), kv_dtype), jnp.zeros((B, arena_tok, C), kv_dtype))
            for i in range(c.num_up_blocks):
                enc[f"up_enc_{i}"] = (jnp.zeros((B, arena_mel, C), kv_dtype), jnp.zeros((B, arena_mel, C), kv_dtype))
            est1 = estimator_stream_state(c.estimator, 2 * B, arena_mel)
        est = jax.tree.map(lambda a: jnp.zeros((c.cfm.n_timesteps,) + a.shape, a.dtype), est1)
        return {"enc": enc, "est": est}

    def grow_stream_state(self, state, new_arena_tok: int):
        """Pad every KV arena to a larger bucket (zeros beyond the frontier
        are masked by the chunk attention mask, so growth is value-neutral)."""
        key0 = "enc_0" if "enc_0" in state["enc"] else None
        if key0 is None:  # dit layout: arenas live only in the estimator
            old = state["est"]["blocks_0"][0].shape[2] // self.cfg.token_mel_ratio
        else:
            old = state["enc"][key0][0].shape[1]  # static under jit
        if new_arena_tok <= old:
            return state
        r = self.cfg.token_mel_ratio
        pad_tok = new_arena_tok - old
        pad_mel = pad_tok * r

        def pad_axis(a, axis, width):
            widths = [(0, 0)] * a.ndim
            widths[axis] = (0, width)
            return jnp.pad(a, widths)

        enc = {}
        for k, v in state["enc"].items():
            if k.startswith("up_enc_"):
                enc[k] = tuple(pad_axis(a, 1, pad_mel) for a in v)
            elif k.startswith("enc_"):
                enc[k] = tuple(pad_axis(a, 1, pad_tok) for a in v)
            else:
                enc[k] = v
        est = {}
        for k, v in state["est"].items():
            if "_tf_" in k or k.startswith("blocks_"):  # KV arenas [steps, 2B, A_mel, inner]
                est[k] = tuple(pad_axis(a, 2, pad_mel) for a in v)
            else:
                est[k] = v
        return {"enc": enc, "est": est}

    def inference_chunk(
        self,
        params: dict,
        token_chunk: jax.Array,     # [B, n] new tokens (tail beyond real_n padded)
        context_token,              # [B, la] lookahead tokens or None (finalize)
        conds_chunk: jax.Array,     # [B, n*r, 80] prompt-mel slice at this chunk's mel offset
        embedding: jax.Array,       # [B, 192]
        state: dict,
        pos_tok,                    # traced scalar: tokens already consumed
        real_n,                     # traced scalar: true new tokens in this chunk
        temperature: float = 1.0,
    ):
        """One incremental streaming chunk: returns (mel [B, n*r, 80], state).
        Rows [0, real_n*r) match the full-prefix streaming recompute's new
        rows (golden-tested chunked == recompute)."""
        c = self.cfg
        mu, enc_st = self.encoder.apply(
            params["encoder"], token_chunk, context_token, state["enc"], pos_tok, real_n,
            method="forward_chunk",
        )
        spks = self.encoder.apply(params["encoder"], embedding, method="project_spk")
        n_mel = mu.shape[1]
        pos_mel = pos_tok * c.token_mel_ratio
        z_full = jnp.asarray(fixed_noise_buffer())
        z = jax.lax.dynamic_slice_in_dim(z_full, pos_mel, n_mel, axis=0)[None] * temperature
        z = jnp.broadcast_to(z, (mu.shape[0], n_mel, z.shape[-1]))

        def est_chunk(p, x2, mu2, t2, spks2, cond2, cache, pos, rn):
            ones = jnp.ones((x2.shape[0], x2.shape[1]), jnp.float32)
            return self.estimator.apply(
                p, x2, ones, mu2, t2, spks2, cond2, False, (cache, pos, rn)
            )

        mel, est_st = solve_euler_chunk(
            est_chunk, params["estimator"], z, mu, spks, conds_chunk, c.cfm,
            state["est"], pos_mel, real_n * c.token_mel_ratio,
        )
        return mel, {"enc": enc_st, "est": est_st}

    # ---------------- training ----------------
    def loss(
        self,
        params: dict,
        rng: jax.Array,
        token: jax.Array,
        token_len: jax.Array,
        feat: jax.Array,
        feat_len: jax.Array,
        embedding: jax.Array,
        streaming: bool,
        cond_drop_rng: Optional[jax.Array] = None,
    ):
        """Unified streaming/offline CFM training step (flow.py:186-233).

        feat: [B, Tmel, 80] target mel; token already includes no lookahead
        split (training always runs finalize semantics). The random
        prompt-conditioning prefix (0-30% of feat, 50% of the time) comes from
        `cond_drop_rng`.
        """
        k_cond, k_cfm = jax.random.split(rng)
        mu, mel_mask = self.encoder.apply(params["encoder"], token, token_len, streaming=streaming)
        spks = self.encoder.apply(params["encoder"], embedding, method="project_spk")

        B, Tmel, _ = feat.shape
        # random conditioning prefix: index ~ U[0, 0.3*feat_len) when coin<0.5
        k1, k2 = jax.random.split(cond_drop_rng if cond_drop_rng is not None else k_cond)
        coin = jax.random.uniform(k1, (B,))
        frac = jax.random.uniform(k2, (B,))
        idx = jnp.where(coin < 0.5, (frac * 0.3 * feat_len).astype(jnp.int32), 0)
        cond_mask = (jnp.arange(Tmel)[None, :] < idx[:, None]).astype(feat.dtype)
        conds = feat * cond_mask[..., None]

        mask_f = make_non_pad_mask(feat_len, Tmel).astype(feat.dtype)
        mu = mu[:, :Tmel]
        loss, _ = cfm_loss(
            self._estimator_apply,
            params["estimator"],
            k_cfm,
            feat,
            mask_f,
            mu,
            spks,
            conds,
            self.cfg.cfm,
            streaming=streaming,
        )
        return loss
