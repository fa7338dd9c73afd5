"""Numeric parity tests for the three DSP feature frontends.

These features feed the conversion chain's inputs — CAM++ x-vectors
(kaldi fbank, reference cli/frontend.py:108-118), the S3 speech tokenizer
(whisper 128-mel, frontend.py:95-106) and the flow prompt mel (matcha
mel_spectrogram, examples/libritts/cosyvoice2/conf/cosyvoice2.yaml:150-158).
librosa / torchaudio / whisper are not installed in this image, so each
production extractor is checked against an INDEPENDENT from-the-spec
implementation written here with deliberately different machinery:

* torch.stft (center / center=False paths) instead of frame_signal+rfft;
* filterbanks built with explicit scalar loops from the published formulas
  (librosa slaney algorithm; Kaldi's mel-domain triangles), instead of the
  vectorized ramps in ops/mel.py;
* per-frame python loops for the Kaldi pipeline (dc-offset, preemphasis
  with the x[0]-0.97*x[0] boundary, povey window (hann^0.85 over N-1),
  512-pt power FFT, ln floor at f32 eps).

A shared convention bug (e.g. both using a periodic window where the spec
says symmetric) can't be caught this way, so the window/padding conventions
are additionally asserted directly against the published constants.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cosyvoice_tpu.ops import kaldi_fbank, mel_spectrogram, whisper_log_mel
from cosyvoice_tpu.ops.mel import (
    _povey_window,
    mel_filterbank_htk,
    mel_filterbank_slaney,
)


# ---------------------------------------------------------------------------
# independent filterbanks (explicit loops, float64)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney_scalar(f: float) -> float:
    # librosa.hz_to_mel(htk=False): linear below 1 kHz (f_sp=200/3),
    # logarithmic above (step ln(6.4)/27)
    if f >= 1000.0:
        return 15.0 + 27.0 * np.log(f / 1000.0) / np.log(6.4)
    return f / (200.0 / 3.0)


def _mel_to_hz_slaney_scalar(m: float) -> float:
    if m >= 15.0:
        return 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0))
    return (200.0 / 3.0) * m


def _slaney_bank_loops(sr, n_fft, n_mels, fmin, fmax):
    """librosa.filters.mel(htk=False, norm='slaney'), built point-by-point:
    triangles in Hz space between mel-spaced points, area-normalized."""
    n_bins = n_fft // 2 + 1
    mlo, mhi = _hz_to_mel_slaney_scalar(fmin), _hz_to_mel_slaney_scalar(fmax)
    pts = [_mel_to_hz_slaney_scalar(mlo + (mhi - mlo) * k / (n_mels + 1))
           for k in range(n_mels + 2)]
    bank = np.zeros((n_mels, n_bins), np.float64)
    for m in range(n_mels):
        f_l, f_c, f_r = pts[m], pts[m + 1], pts[m + 2]
        for j in range(n_bins):
            f = j * (sr / 2.0) / (n_bins - 1)
            w = min((f - f_l) / (f_c - f_l), (f_r - f) / (f_r - f_c))
            if w > 0:
                bank[m, j] = w * 2.0 / (f_r - f_l)  # slaney area norm
    return bank


def _hz_to_mel_htk_scalar(f: float) -> float:
    return 1127.0 * np.log(1.0 + f / 700.0)


def _kaldi_bank_loops(sr, n_fft, n_mels, fmin, fmax):
    """Kaldi MelBanks (torchaudio.compliance.kaldi.get_mel_banks): triangles
    in MEL space, unnormalized, nyquist bin zero-weighted."""
    n_bins = n_fft // 2 + 1
    mlo, mhi = _hz_to_mel_htk_scalar(fmin), _hz_to_mel_htk_scalar(fmax)
    delta = (mhi - mlo) / (n_mels + 1)
    bank = np.zeros((n_mels, n_bins), np.float64)
    for m in range(n_mels):
        left, center, right = mlo + m * delta, mlo + (m + 1) * delta, mlo + (m + 2) * delta
        for j in range(n_bins):
            mel = _hz_to_mel_htk_scalar(j * sr / n_fft)
            if left < mel <= center:
                bank[m, j] = (mel - left) / (center - left)
            elif center < mel < right:
                bank[m, j] = (right - mel) / (right - center)
    return bank


# ---------------------------------------------------------------------------
# independent extractors
# ---------------------------------------------------------------------------

def _matcha_mel_torch(x: np.ndarray) -> np.ndarray:
    """matcha.utils.audio.mel_spectrogram / HiFi-GAN meldataset semantics
    (cosyvoice2.yaml:150-158): reflect pad (n_fft-hop)/2, center=False STFT,
    periodic hann, sqrt(|S|^2 + 1e-9), slaney mel, ln(clamp 1e-5)."""
    n_fft, hop, win = 1920, 480, 1920
    y = torch.from_numpy(x).double()
    pad = (n_fft - hop) // 2
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win, dtype=torch.float64),
        center=False, normalized=False, onesided=True, return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    fb = torch.from_numpy(_slaney_bank_loops(24000, n_fft, 80, 0.0, 8000.0))
    mel = torch.matmul(fb, mag)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


def _whisper_logmel_torch(x: np.ndarray, n_mels: int = 128) -> np.ndarray:
    """whisper.audio.log_mel_spectrogram: center STFT n_fft 400 hop 160,
    periodic hann, drop last frame, power spectrum, slaney 128-mel
    (mel_filters.npz was generated with librosa.filters.mel(16000, 400)),
    log10 clamp 1e-10, global max-8 floor, (x+4)/4."""
    y = torch.from_numpy(x).double()
    spec = torch.stft(
        y, 400, hop_length=160,
        window=torch.hann_window(400, dtype=torch.float64),
        center=True, pad_mode="reflect", return_complex=True,
    )
    power = (spec.real**2 + spec.imag**2)[..., :-1]
    fb = torch.from_numpy(_slaney_bank_loops(16000, 400, n_mels, 0.0, 8000.0))
    mel = torch.matmul(fb, power)
    log_spec = torch.clamp(mel, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


def _kaldi_fbank_numpy(x: np.ndarray, n_mels: int = 80, cmn: bool = False) -> np.ndarray:
    """torchaudio.compliance.kaldi.fbank(dither=0, energy unused) defaults,
    per-frame loop: snip_edges framing, remove_dc_offset, preemphasis 0.97
    (first sample vs itself), povey window, 512-pt power FFT, Kaldi mel
    (low 20 Hz, high nyquist), ln floor at float32 eps."""
    frame_len, shift, n_fft, sr = 400, 160, 512, 16000
    bank = _kaldi_bank_loops(sr, n_fft, n_mels, 20.0, sr / 2.0)
    n_frames = 1 + (len(x) - frame_len) // shift
    n = np.arange(frame_len)
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * n / (frame_len - 1))) ** 0.85
    eps = float(np.finfo(np.float32).eps)
    out = np.zeros((n_frames, n_mels), np.float64)
    for t in range(n_frames):
        seg = x[t * shift : t * shift + frame_len].astype(np.float64)
        seg = seg - seg.mean()
        pre = np.empty_like(seg)
        pre[0] = seg[0] - 0.97 * seg[0]
        pre[1:] = seg[1:] - 0.97 * seg[:-1]
        spec = np.fft.rfft(pre * povey, n=n_fft)
        power = spec.real**2 + spec.imag**2
        out[t] = np.log(np.maximum(bank @ power, eps))
    if cmn:
        out = out - out.mean(axis=0, keepdims=True)
    return out


def _speechlike(seconds: float, sr: int, seed: int = 0) -> np.ndarray:
    """Deterministic multi-tone + noise signal in [-1,1] (speech-ish spectrum)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = sum(a * np.sin(2 * np.pi * f * t + p) for a, f, p in
              [(0.4, 220.0, 0.1), (0.25, 733.0, 1.3), (0.15, 1870.0, 2.2), (0.08, 4200.0, 0.7)])
    sig = sig * (0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t))  # amplitude modulation
    sig += 0.02 * rng.standard_normal(len(t))
    return sig.astype(np.float32)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

class TestFilterbankParity:
    def test_slaney_bank_matches_independent(self):
        for sr, n_fft, n_mels in [(24000, 1920, 80), (16000, 400, 128)]:
            ours = mel_filterbank_slaney(sr, n_fft, n_mels, 0.0, 8000.0)
            theirs = _slaney_bank_loops(sr, n_fft, n_mels, 0.0, 8000.0)
            np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_kaldi_bank_matches_independent(self):
        ours = mel_filterbank_htk(16000, 512, 80, 20.0, 8000.0)
        theirs = _kaldi_bank_loops(16000, 512, 80, 20.0, 8000.0)
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_povey_window_constants(self):
        # published Kaldi povey window: hann(symmetric, N-1 denominator)^0.85
        w = _povey_window(400)
        assert w[0] == 0.0 and abs(w[399]) < 1e-12  # symmetric endpoints
        mid = (0.5 - 0.5 * np.cos(2 * np.pi * 199.5 / 399)) ** 0.85
        np.testing.assert_allclose(w[199:201].mean(), mid, rtol=1e-4)


class TestMatchaMelParity:
    def test_matcha_mel_matches_torch_stft(self):
        x = _speechlike(1.3, 24000)[None, :]  # [1, L]
        ours = np.asarray(mel_spectrogram(jnp.asarray(x)))
        theirs = _matcha_mel_torch(x)
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)

    def test_matcha_mel_quiet_signal_hits_floor(self):
        # ln(clamp 1e-5) floor must engage identically
        x = (_speechlike(0.5, 24000) * 1e-6)[None, :]
        ours = np.asarray(mel_spectrogram(jnp.asarray(x)))
        theirs = _matcha_mel_torch(x)
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)
        assert np.isclose(ours, np.log(1e-5), atol=1e-5).any()


class TestWhisperMelParity:
    def test_whisper_mel_matches_torch_stft(self):
        x = _speechlike(1.0, 16000)
        ours = np.asarray(whisper_log_mel(jnp.asarray(x)))
        theirs = _whisper_logmel_torch(x)
        assert ours.shape == theirs.shape  # [128, L//160]
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)

    def test_whisper_mel_dynamic_floor(self):
        # the max-8 floor is global over the whole feature map
        x = np.concatenate([_speechlike(0.4, 16000), np.zeros(6400, np.float32)])
        ours = np.asarray(whisper_log_mel(jnp.asarray(x)))
        theirs = _whisper_logmel_torch(x)
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(ours.min(), ours.max() - 2.0, atol=1e-5)


class TestKaldiFbankParity:
    def test_kaldi_fbank_matches_spec_loop(self):
        x = _speechlike(1.0, 16000)
        ours = np.asarray(kaldi_fbank(jnp.asarray(x)))
        theirs = _kaldi_fbank_numpy(x)
        assert ours.shape == theirs.shape == (98, 80)
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)

    def test_kaldi_fbank_cmn_matches_spec_loop(self):
        # CMN as applied before CAM++ (reference cli/frontend.py:114); the
        # non-vacuous check is full-value parity, not column means
        x = _speechlike(0.7, 16000, seed=3)
        ours = np.asarray(kaldi_fbank(jnp.asarray(x), cmn=True))
        theirs = _kaldi_fbank_numpy(x, cmn=True)
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)

    def test_kaldi_fbank_scale_invariant_after_cmn(self):
        # log-mel + CMN removes constant gain — int16-range vs [-1,1] input
        # conventions must agree post-CMN (what CAM++ actually consumes)
        x = _speechlike(0.5, 16000, seed=4)
        a = np.asarray(kaldi_fbank(jnp.asarray(x), cmn=True))
        b = np.asarray(kaldi_fbank(jnp.asarray(x * 32768.0), cmn=True))
        np.testing.assert_allclose(a, b, atol=2e-3)

    def test_preemphasis_boundary_convention(self):
        # Kaldi: first sample of each frame is x0 - 0.97*x0 (offset vs itself,
        # NOT vs the previous frame's sample) — catches the classic off-by-one
        x = np.zeros(720, np.float32)
        x[160] = 1.0  # lands at sample 0 of frame 1
        ours = np.asarray(kaldi_fbank(jnp.asarray(x)))
        theirs = _kaldi_fbank_numpy(x)
        np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-5)
