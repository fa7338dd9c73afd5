"""HiFT GAN training: alternating generator/discriminator steps.

Reference: cosyvoice/hifigan/hifigan.py:32-67 + utils/executor.py:85-144
(train_one_epoc_gan). Losses: generator = adversarial + 2*feature-matching +
45*multi-mel-L1 + TPR + F0 L1; discriminator = LSGAN + TPR.
"""

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from cosyvoice_tpu.models.discriminator import MultipleDiscriminator
from cosyvoice_tpu.ops.mel import mel_spectrogram
from cosyvoice_tpu.train.losses import (
    discriminator_adv_loss,
    f0_l1_loss,
    feature_matching_loss,
    generator_adv_loss,
    mel_l1_loss,
    tpr_loss,
)


@dataclass(frozen=True)
class GanLossConfig:
    mel_weight: float = 45.0
    feat_match_weight: float = 2.0
    tpr_weight: float = 1.0
    f0_weight: float = 1.0
    sample_rate: int = 24000
    mel_hop: int = 480
    mel_fmax: float = 0.0  # 0 => None (full band) for the GAN mel loss


def _gan_mel(wav, cfg: GanLossConfig):
    # grad_safe: forward-identical to the parity mel, but the backward pass
    # crosses the 1e-5 log floor — without it "output silence" is a flat
    # region of the mel loss and random-init generators park there
    return mel_spectrogram(
        wav, sr=cfg.sample_rate, n_fft=cfg.mel_hop * 4, hop=cfg.mel_hop, win=cfg.mel_hop * 4,
        fmax=None if cfg.mel_fmax == 0.0 else cfg.mel_fmax, grad_safe=True,
    )


def make_gan_train_steps(hift, disc: MultipleDiscriminator, gen_opt, disc_opt, cfg: GanLossConfig = GanLossConfig()):
    """Returns (gen_step, disc_step), both jitted.

    batch: {'speech': [B, L], 'speech_feat': [B, T, 80], 'pitch_feat': [B, T]}.
    """

    def gen_loss_fn(gen_params, disc_params, batch, rng):
        wav_hat, f0 = hift.apply(gen_params, batch["speech_feat"], rng)
        real = batch["speech"][:, : wav_hat.shape[1]]
        d_fake, f_fake = disc.apply(disc_params, wav_hat)
        d_real, f_real = disc.apply(disc_params, real)
        adv = generator_adv_loss(d_fake)
        fm = feature_matching_loss(f_real, f_fake)
        mel = mel_l1_loss(_gan_mel(real, cfg), _gan_mel(wav_hat, cfg))
        tpr = tpr_loss(d_real, d_fake)
        f0l = f0_l1_loss(batch["pitch_feat"][:, : f0.shape[1]], f0)
        loss = adv + cfg.feat_match_weight * fm + cfg.mel_weight * mel + cfg.tpr_weight * tpr + cfg.f0_weight * f0l
        return loss, {"gen_adv": adv, "fm": fm, "mel": mel, "tpr": tpr, "f0": f0l}

    def disc_loss_fn(disc_params, gen_params, batch, rng):
        wav_hat, _ = hift.apply(gen_params, batch["speech_feat"], rng)
        wav_hat = jax.lax.stop_gradient(wav_hat)
        real = batch["speech"][:, : wav_hat.shape[1]]
        d_fake, _ = disc.apply(disc_params, wav_hat)
        d_real, _ = disc.apply(disc_params, real)
        loss = discriminator_adv_loss(d_real, d_fake) + cfg.tpr_weight * tpr_loss(d_real, d_fake)
        return loss, {"disc_adv": loss}

    @partial(jax.jit, donate_argnums=(0, 1))
    def gen_step(gen_params, gen_opt_state, disc_params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(gen_params, disc_params, batch, rng)
        updates, gen_opt_state = gen_opt.update(grads, gen_opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        metrics["loss"] = loss
        return gen_params, gen_opt_state, metrics

    @partial(jax.jit, donate_argnums=(0, 1))
    def disc_step(disc_params, disc_opt_state, gen_params, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(disc_params, gen_params, batch, rng)
        updates, disc_opt_state = disc_opt.update(grads, disc_opt_state, disc_params)
        disc_params = optax.apply_updates(disc_params, updates)
        metrics["loss"] = loss
        return disc_params, disc_opt_state, metrics

    return gen_step, disc_step


def make_generator_pretrain_step(hift, gen_opt, cfg: GanLossConfig = GanLossConfig()):
    """Generator-only warmup step: mel-L1 + F0 regression, no adversarial
    terms. Pure regression tolerates a much higher learning rate than the
    alternating GAN game (which diverges to NaN at ~5x the HiFi-GAN lr), so
    a short warmup phase gets amplitude/pitch into range quickly before the
    discriminator turns on — the same role as initializing from a pretrained
    hift.pt in the reference recipe (examples/libritts/cosyvoice2/run.sh
    trains hifigan from an existing checkpoint, hifigan yaml).
    """

    def loss_fn(gen_params, batch, rng):
        wav_hat, f0 = hift.apply(gen_params, batch["speech_feat"], rng)
        real = batch["speech"][:, : wav_hat.shape[1]]
        mel = mel_l1_loss(_gan_mel(real, cfg), _gan_mel(wav_hat, cfg))
        f0l = f0_l1_loss(batch["pitch_feat"][:, : f0.shape[1]], f0)
        loss = cfg.mel_weight * mel + cfg.f0_weight * f0l
        return loss, {"mel": mel, "f0": f0l}

    @partial(jax.jit, donate_argnums=(0, 1))
    def pretrain_step(gen_params, gen_opt_state, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(gen_params, batch, rng)
        updates, gen_opt_state = gen_opt.update(grads, gen_opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        metrics["loss"] = loss
        return gen_params, gen_opt_state, metrics

    return pretrain_step
