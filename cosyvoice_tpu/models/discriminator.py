"""GAN discriminators for HiFT training.

Native re-implementation of the reference's discriminator ensemble
(cosyvoice/hifigan/discriminator.py:15-230 + the vendored Matcha
MultiPeriodDiscriminator): MPD (period-folded 2D convs, periods 2/3/5/7/11)
and MRSD (3 magnitude-STFT sub-discriminators at fft 1024/2048/512).

All return (outputs, feature_maps) lists for adversarial + feature-matching
losses (hifigan/hifigan.py:32-67).
"""

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.ops.stft import hann_window, stft


class PeriodDiscriminator(nn.Module):
    """One MPD branch: fold wav into [T/p, p] and run strided 2D convs."""

    period: int
    channels: Tuple[int, ...] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, x):
        """x: [B, L] -> (score [B, n], feature maps)."""
        B, L = x.shape
        pad = (self.period - L % self.period) % self.period
        x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect" if L > 1 else "constant")
        x = x.reshape(B, -1, self.period, 1)  # [B, T/p, p, 1]
        fmaps = []
        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)), name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.1)
            fmaps.append(x)
        x = nn.Conv(self.channels[-1], (5, 1), padding=((2, 2), (0, 0)), name="conv_4")(x)
        x = jax.nn.leaky_relu(x, 0.1)
        fmaps.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(B, -1), fmaps


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    channels: Tuple[int, ...] = (32, 128, 512, 1024)

    @nn.compact
    def __call__(self, x):
        outs, fmaps = [], []
        for p in self.periods:
            o, f = PeriodDiscriminator(p, self.channels, name=f"mpd_{p}")(x)
            outs.append(o)
            fmaps.extend(f)
        return outs, fmaps


class SpecDiscriminator(nn.Module):
    """Magnitude-STFT discriminator (discriminator.py:196-230)."""

    n_fft: int
    hop: int

    @nn.compact
    def __call__(self, x):
        spec = stft(x, self.n_fft, self.hop, hann_window(self.n_fft))
        mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
        h = jnp.swapaxes(mag, 1, 2)[..., None]  # [B, T, F, 1]
        fmaps = []
        for i, (ch, st) in enumerate(((32, (1, 1)), (32, (2, 2)), (32, (1, 1)), (32, (2, 2)))):
            h = nn.Conv(ch, (3, 9) if i < 3 else (3, 3), strides=st, padding="SAME", name=f"conv_{i}")(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmaps.append(h)
        h = nn.Conv(1, (3, 3), padding="SAME", name="conv_post")(h)
        fmaps.append(h)
        return h.reshape(x.shape[0], -1), fmaps


class MultiResSpecDiscriminator(nn.Module):
    resolutions: Tuple[Tuple[int, int], ...] = ((1024, 120), (2048, 240), (512, 50))

    @nn.compact
    def __call__(self, x):
        outs, fmaps = [], []
        for n_fft, hop in self.resolutions:
            o, f = SpecDiscriminator(n_fft, hop, name=f"mrd_{n_fft}")(x)
            outs.append(o)
            fmaps.extend(f)
        return outs, fmaps


class MultipleDiscriminator(nn.Module):
    """MPD + MRSD ensemble (discriminator.py:15-35).

    `mpd_channels` scales the MPD conv widths — the reference hardcodes
    (32, 128, 512, 1024); tiny-footprint training (hermetic quality runs,
    CI) shrinks it without changing the ensemble topology.
    """

    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    mpd_channels: Tuple[int, ...] = (32, 128, 512, 1024)
    mrd_resolutions: Tuple[Tuple[int, int], ...] = ((1024, 120), (2048, 240), (512, 50))

    @nn.compact
    def __call__(self, x):
        o1, f1 = MultiPeriodDiscriminator(self.mpd_periods, self.mpd_channels, name="mpd")(x)
        o2, f2 = MultiResSpecDiscriminator(self.mrd_resolutions, name="mrd")(x)
        return o1 + o2, f1 + f2
