"""Mel / fbank feature extractors (XLA).

Three extractors with the exact numerics the reference pipeline depends on:

1. `mel_spectrogram` — HiFi-GAN/Matcha-style 80-mel used for flow prompt feats
   and GAN training (reference: matcha.utils.audio.mel_spectrogram, configured
   n_fft=1920 hop=480 win=1920 fmin=0 fmax=8000/None center=False in
   examples/libritts/cosyvoice2/conf/cosyvoice2.yaml:150-158). Slaney-norm mel,
   reflect pad (n_fft-hop)/2, ln(clamp(.,1e-5)) compression.
2. `whisper_log_mel` — 128-mel whisper frontend feeding the S3 speech tokenizer
   (reference: cli/frontend.py:95-106 via whisper.log_mel_spectrogram).
3. `kaldi_fbank` — 80-dim kaldi fbank feeding the CAM++ x-vector model
   (reference: cli/frontend.py:108-118, torchaudio.compliance.kaldi.fbank
   with dither=0).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.ops.stft import frame_signal, hann_window


# ---------------------------------------------------------------------------
# filterbank construction (host-side numpy, cached)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank_slaney(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') equivalent: [n_mels, n_fft//2+1]."""
    if fmax is None:
        fmax = sr / 2
    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = _mel_to_hz_slaney(np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def mel_filterbank_htk(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Kaldi/HTK-style mel bank (1127*ln(1+f/700), unnormalized): [n_mels, n_fft//2+1]."""
    def h2m(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    fftfreqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    mel_lo, mel_hi = h2m(fmin), h2m(fmax)
    centers = np.linspace(mel_lo, mel_hi, n_mels + 2)
    mel_bins = h2m(fftfreqs)
    lower = (mel_bins[None, :] - centers[:-2, None]) / (centers[1:-1] - centers[:-2])[:, None]
    upper = (centers[2:, None] - mel_bins[None, :]) / (centers[2:] - centers[1:-1])[:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# extractors
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_fft", "hop", "win", "sr", "n_mels", "fmin", "fmax", "grad_safe"))
def mel_spectrogram(
    x: jax.Array,
    sr: int = 24000,
    n_fft: int = 1920,
    hop: int = 480,
    win: int = 1920,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    grad_safe: bool = False,
) -> jax.Array:
    """Matcha/HiFi-GAN mel: [..., L] -> [..., n_mels, T] with T = 1 + (L-hop)//hop.

    Matches matcha.utils.audio.mel_spectrogram (center=False + manual reflect
    pad of (n_fft-hop)/2, magnitude sqrt(power+1e-9), ln(clamp(., 1e-5))).

    grad_safe=True keeps the forward value bit-identical but routes the
    backward pass through ln(mel + 1e-5) instead of the hard floor clamp:
    below the 1e-5 floor the parity formula has ZERO gradient, which makes
    "output silence" a flat trap for any vocoder loss built on this mel
    (observed: random-init HiFT training parks at rms 0 under the parity
    mel). Feature extraction and goldens always use the default.
    """
    fb = jnp.asarray(mel_filterbank_slaney(sr, n_fft, n_mels, fmin, fmax))
    pad = (n_fft - hop) // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(xp, win, hop) * hann_window(win)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    mel = jnp.einsum("...tf,mf->...mt", mag, fb)
    hard = jnp.log(jnp.clip(mel, min=1e-5))
    if not grad_safe:
        return hard
    smooth = jnp.log(mel + 1e-5)
    # forward value is exactly `hard` (the smooth terms cancel bitwise);
    # the backward pass sees only `smooth`'s gradient
    return jax.lax.stop_gradient(hard) + (smooth - jax.lax.stop_gradient(smooth))


@partial(jax.jit, static_argnames=("n_mels",))
def whisper_log_mel(x: jax.Array, n_mels: int = 128) -> jax.Array:
    """Whisper log-mel: 16 kHz [..., L] -> [..., n_mels, T], T = L//160.

    Matches whisper.audio.log_mel_spectrogram (n_fft 400, hop 160, center
    reflect pad, power spectrum, slaney mel, log10 clamp 1e-10, max-8 floor,
    (x+4)/4 scaling; last STFT frame dropped).
    """
    fb = jnp.asarray(mel_filterbank_slaney(16000, 400, n_mels, 0.0, 8000.0))
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(200, 200)], mode="reflect")
    frames = frame_signal(xp, 400, 160) * hann_window(400)
    spec = jnp.fft.rfft(frames, n=400, axis=-1)[..., :-1, :]  # drop last frame
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.einsum("...tf,mf->...mt", power, fb)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def _povey_window(n: int) -> np.ndarray:
    return ((0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85).astype(np.float32)


@partial(jax.jit, static_argnames=("sr", "n_mels", "frame_len", "frame_shift", "cmn"))
def kaldi_fbank(
    x: jax.Array,
    sr: int = 16000,
    n_mels: int = 80,
    frame_len: int = 400,
    frame_shift: int = 160,
    cmn: bool = False,
) -> jax.Array:
    """torchaudio.compliance.kaldi.fbank(dither=0) equivalent: [L] -> [T, n_mels].

    snip_edges=True framing, DC removal, povey window, preemphasis 0.97,
    512-point power FFT, HTK mel (low 20 Hz, high nyquist), ln(max(., eps)).
    Optional CMN (mean subtraction over time) as done for CAM++ x-vector input
    (reference: cli/frontend.py:114).
    """
    n_fft = 512
    fb = jnp.asarray(mel_filterbank_htk(sr, n_fft, n_mels, 20.0, sr / 2.0))
    frames = frame_signal(x, frame_len, frame_shift)  # [T, frame_len]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # remove_dc_offset
    pre = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * pre
    frames = frames * jnp.asarray(_povey_window(frame_len))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel = jnp.einsum("...tf,mf->...tm", power, fb)
    feats = jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))
    if cmn:
        feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
    return feats
