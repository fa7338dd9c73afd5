"""CosyVoice v1 flow: MaskedDiffWithXvec (non-causal conformer + interpolate
length-regulator + CFM with z/mu prompt cache).

Re-design of cosyvoice/flow/flow.py:25-146 and flow/length_regulator.py.
The 50 Hz speech tokens are interpolated to the 22.05 kHz/256-hop mel rate
(1 token -> 22050/256/50 ~ 1.72 frames) with the reference's head/mid/tail
split around the 20-token streaming overlap, then refined by a small conv
stack. Streaming continuity comes from pinning the prompt + last-34-frame
(z, mu) pair across chunks (flow_matching.py:57-64).

v1 runs on exact shapes (no bucketing): the streaming windows are fixed
(hop + overlap) after the first chunk so only a handful of XLA programs are
ever compiled per session.
"""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.models.flow_decoder import ConditionalDecoder, EstimatorConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig, solve_euler
from cosyvoice_tpu.nn.activation import mish
from cosyvoice_tpu.nn.conformer import ConformerEncoder
from cosyvoice_tpu.nn.conv import Conv1d
from cosyvoice_tpu.ops.masks import make_non_pad_mask
from cosyvoice_tpu.ops.resample import interpolate_linear


@dataclass(frozen=True)
class FlowV1Config:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 4096
    input_frame_rate: int = 50
    sample_rate: int = 22050
    mel_hop: int = 256
    token_overlap_len: int = 20
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    regulator_ratios: Tuple[int, ...] = (1, 1, 1, 1)
    estimator: EstimatorConfig = field(
        default_factory=lambda: EstimatorConfig(channels=(256, 256), causal=False)
    )
    cfm: CFMConfig = field(default_factory=CFMConfig)

    @property
    def overlap_mel(self) -> int:
        # 20 tokens -> 34 mel frames at 22.05k/256 (cli/model.py:45)
        return int(self.token_overlap_len / self.input_frame_rate * self.sample_rate / self.mel_hop)

    def mel_len(self, n_tokens: int) -> int:
        return int(n_tokens / self.input_frame_rate * self.sample_rate / self.mel_hop)


class RegulatorConvStack(nn.Module):
    """Post-interpolation conv refinement (length_regulator.py:29-42)."""

    channels: int = 80
    num_layers: int = 4

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = Conv1d(self.channels, 3, padding=1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5, name=f"norm_{i}")(x)
            x = mish(x)
        return Conv1d(self.channels, 1, name="proj")(x)


class FlowV1Encoder(nn.Module):
    cfg: FlowV1Config

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size)
        self.spk_embed_affine_layer = nn.Dense(c.output_size)
        self.encoder = ConformerEncoder(
            output_size=c.input_size,
            attention_heads=c.attention_heads,
            linear_units=c.linear_units,
            num_blocks=c.num_blocks,
            input_layer="linear",
        )
        self.encoder_proj = nn.Dense(c.output_size)
        self.regulator = RegulatorConvStack(c.output_size, len(c.regulator_ratios))

    def init_all(self, tok1, tok2, mel_len1: int, mel_len2: int, embedding):
        """Trace every submodule once for init()."""
        tok = jnp.concatenate([tok1, tok2], axis=1)
        h = self.encode(tok, jnp.asarray([tok.shape[1]]))
        out = self.regulate_inference(h[:, : tok1.shape[1]], h[:, tok1.shape[1] :], mel_len1, mel_len2)
        return out, self.project_spk(embedding)

    def project_spk(self, embedding):
        embedding = embedding / (jnp.linalg.norm(embedding, axis=-1, keepdims=True) + 1e-12)
        return self.spk_embed_affine_layer(embedding)

    def encode(self, token, token_len, deterministic=True):
        mask = make_non_pad_mask(token_len, token.shape[1])
        emb = self.input_embedding(jnp.clip(token, 0)) * mask[..., None]
        h, _ = self.encoder(emb, token_len, deterministic=deterministic)
        return self.encoder_proj(h)

    def regulate_inference(self, h1, h2, mel_len1: int, mel_len2: int):
        """h1: [1, Lp, 80] prompt tokens; h2: [1, Lt, 80] target tokens.
        Static mel lengths. Head/mid/tail split (length_regulator.py:52-70)."""
        c = self.cfg
        ov = c.overlap_mel
        h2t = jnp.swapaxes(h2, 1, 2)
        if h2.shape[1] > 2 * c.token_overlap_len:
            head = interpolate_linear(h2t[:, :, : c.token_overlap_len], ov)
            mid = interpolate_linear(h2t[:, :, c.token_overlap_len : -c.token_overlap_len], mel_len2 - 2 * ov)
            tail = interpolate_linear(h2t[:, :, -c.token_overlap_len :], ov)
            x2 = jnp.concatenate([head, mid, tail], axis=2)
        else:
            x2 = interpolate_linear(h2t, mel_len2)
        if h1.shape[1] != 0:
            x1 = interpolate_linear(jnp.swapaxes(h1, 1, 2), mel_len1)
            x = jnp.concatenate([x1, x2], axis=2)
        else:
            x = x2
        return self.regulator(jnp.swapaxes(x, 1, 2))

    def regulate_train(self, h, mel_len: int, feat_len):
        x = interpolate_linear(jnp.swapaxes(h, 1, 2), mel_len)
        out = self.regulator(jnp.swapaxes(x, 1, 2))
        mask = make_non_pad_mask(feat_len, mel_len)
        return out * mask[..., None].astype(out.dtype)


class MaskedDiffFlow:
    """v1 flow orchestrator with z/mu streaming cache."""

    def __init__(self, cfg: FlowV1Config = FlowV1Config()):
        self.cfg = cfg
        self.encoder = FlowV1Encoder(cfg)
        self.estimator = ConditionalDecoder(cfg.estimator)

    def init(self, rng: jax.Array) -> dict:
        from cosyvoice_tpu.utils.devices import jit_init

        k1, k2 = jax.random.split(rng)
        tok = jnp.zeros((1, 20), jnp.int32)
        # the 17/17 length args stay static (the encoder uses them as shapes)
        enc = jit_init(
            lambda k, t1, t2, spk: self.encoder.init(k, t1, t2, 17, 17, spk, method="init_all"),
            k1, tok[:, :10], tok[:, 10:], jnp.zeros((1, self.cfg.spk_embed_dim)),
        )
        T = 34
        est = jit_init(
            self.estimator.init,
            k2,
            jnp.zeros((1, T, 80)),
            jnp.ones((1, T)),
            jnp.zeros((1, T, 80)),
            jnp.zeros((1,)),
            jnp.zeros((1, 80)),
            jnp.zeros((1, T, 80)),
        )
        return {"encoder": enc, "estimator": est}

    def _estimator_apply(self, params, x, mask, mu, t, spks, cond, streaming):
        return self.estimator.apply(params, x, mask, mu, t, spks, cond, streaming)

    def inference(
        self,
        params: dict,
        rng: jax.Array,
        token: jax.Array,  # [1, L] prompt_token + chunk tokens (exact length)
        prompt_token_len: int,
        prompt_feat: jax.Array,  # [1, mel_len1, 80]
        embedding: jax.Array,  # [1, 192]
        cache: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """Returns (mel [1, mel_len2, 80], new (z, mu) cache)."""
        c = self.cfg
        L = token.shape[1]
        token_len2 = L - prompt_token_len
        mel_len1 = prompt_feat.shape[1]
        mel_len2 = c.mel_len(token_len2)

        h = self.encoder.apply(params["encoder"], token, jnp.asarray([L]), method="encode")
        spks = self.encoder.apply(params["encoder"], embedding, method="project_spk")
        mu = self.encoder.apply(
            params["encoder"], h[:, :prompt_token_len], h[:, prompt_token_len:], mel_len1, mel_len2,
            method="regulate_inference",
        )
        T = mel_len1 + mel_len2
        conds = jnp.zeros((1, T, 80), mu.dtype).at[:, :mel_len1].set(prompt_feat)
        mask = jnp.ones((1, T), mu.dtype)

        z = jax.random.normal(rng, (1, T, 80), mu.dtype)
        if cache is not None:
            zc, muc = cache
            lc = min(zc.shape[1], T)  # guard tiny finalize chunks
            z = jnp.concatenate([zc[:, :lc], z[:, lc:]], axis=1)
            mu = jnp.concatenate([muc[:, :lc], mu[:, lc:]], axis=1)
        ov = c.overlap_mel
        new_cache = (
            jnp.concatenate([z[:, :mel_len1], z[:, T - ov :]], axis=1),
            jnp.concatenate([mu[:, :mel_len1], mu[:, T - ov :]], axis=1),
        )
        mel = solve_euler(
            self._estimator_apply, params["estimator"], z, mu, mask, spks, conds, c.cfm, streaming=False
        )
        return mel[:, mel_len1:], new_cache

    def loss(self, params, rng, token, token_len, feat, feat_len, embedding):
        """CFM training loss (flow.py:58-100)."""
        from cosyvoice_tpu.models.flow_matching import cfm_loss

        k_cond, k_cfm = jax.random.split(rng)
        Tmel = feat.shape[1]
        h = self.encoder.apply(params["encoder"], token, token_len, method="encode")
        spks = self.encoder.apply(params["encoder"], embedding, method="project_spk")
        mu = self.encoder.apply(params["encoder"], h, Tmel, feat_len, method="regulate_train")

        B = feat.shape[0]
        k1, k2 = jax.random.split(k_cond)
        coin = jax.random.uniform(k1, (B,))
        frac = jax.random.uniform(k2, (B,))
        idx = jnp.where(coin < 0.5, (frac * 0.3 * feat_len).astype(jnp.int32), 0)
        cond_mask = (jnp.arange(Tmel)[None, :] < idx[:, None]).astype(feat.dtype)
        conds = feat * cond_mask[..., None]
        mask = make_non_pad_mask(feat_len, Tmel).astype(feat.dtype)
        loss, _ = cfm_loss(
            self._estimator_apply, params["estimator"], k_cfm, feat, mask, mu, spks, conds, self.cfg.cfm
        )
        return loss
