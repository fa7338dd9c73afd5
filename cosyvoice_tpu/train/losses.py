"""Training losses.

- `lm_ce_loss`: label-smoothing CE over the speech-token head. The reference
  implements label smoothing as KL vs the smoothed distribution with
  per-token normalization (transformer/label_smoothing_loss.py:54-96,
  lsm_weight=0 in shipped configs => plain masked CE).
- GAN losses for HiFT training (hifigan/hifigan.py:32-67, utils/losses.py).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

IGNORE_ID = -100


def lm_ce_loss(logits: jax.Array, targets: jax.Array, smoothing: float = 0.0, normalize_length: bool = True):
    """logits: [B, T, V]; targets: [B, T] with IGNORE_ID padding.

    Returns (loss, accuracy)."""
    V = logits.shape[-1]
    valid = targets != IGNORE_ID
    tgt = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    conf = 1.0 - smoothing
    smooth = smoothing / (V - 1)
    true_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    # KL(smoothed || pred) up to a constant == -(conf*logp_true + smooth*sum(logp_other))
    nll = -(conf * true_lp + smooth * (jnp.sum(logp, axis=-1) - true_lp))
    denom = jnp.maximum(jnp.sum(valid), 1) if normalize_length else logits.shape[0]
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / denom

    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum((pred == tgt) & valid) / jnp.maximum(jnp.sum(valid), 1)
    return loss, acc


def mel_l1_loss(real_mel: jax.Array, fake_mel: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(real_mel - fake_mel))


def feature_matching_loss(feats_real: Sequence, feats_fake: Sequence) -> jax.Array:
    loss = 0.0
    for fr, ff in zip(feats_real, feats_fake):
        loss = loss + jnp.mean(jnp.abs(fr - ff))
    return loss


def generator_adv_loss(disc_fake_outs: Sequence) -> jax.Array:
    loss = 0.0
    for d in disc_fake_outs:
        loss = loss + jnp.mean(jnp.square(1.0 - d))
    return loss


def discriminator_adv_loss(disc_real_outs: Sequence, disc_fake_outs: Sequence) -> jax.Array:
    loss = 0.0
    for dr, df in zip(disc_real_outs, disc_fake_outs):
        loss = loss + jnp.mean(jnp.square(1.0 - dr)) + jnp.mean(jnp.square(df))
    return loss


def tpr_loss(disc_real_outs: Sequence, disc_fake_outs: Sequence, tau: float = 0.04) -> jax.Array:
    """Truncated pointwise relativistic loss (utils/losses.py:6-15):
    m = median(dr - dg); L_rel = mean(((dr-dg)-m)^2 over elements with
    dr < dg + m); per-discriminator contribution = min(tau, L_rel)
    (written as tau - relu(tau - L_rel))."""
    loss = 0.0
    for dr, dg in zip(disc_real_outs, disc_fake_outs):
        diff = jnp.reshape(dr - dg, (-1,))
        m = jnp.median(diff)
        sel = (diff < m).astype(diff.dtype)
        l_rel = jnp.sum(jnp.square(diff - m) * sel) / jnp.maximum(jnp.sum(sel), 1.0)
        loss = loss + tau - jax.nn.relu(tau - l_rel)
    return loss


def f0_l1_loss(real_f0: jax.Array, pred_f0: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(real_f0 - pred_f0))
