"""Native YIN F0 extractor (csrc/f0_yin.cc) — the pyworld role in the GAN
training pipeline."""

import numpy as np
import pytest

from cosyvoice_tpu.ops.f0 import extract_f0, yin_f0, yin_f0_numpy

SR = 24000
HOP = 480


def _tone(freq, seconds=1.0, sr=SR, harmonics=3):
    t = np.arange(int(sr * seconds)) / sr
    x = np.zeros_like(t, np.float32)
    for h in range(1, harmonics + 1):
        x += (0.6 / h) * np.sin(2 * np.pi * freq * h * t).astype(np.float32)
    return x


@pytest.mark.parametrize("freq", [110.0, 220.0, 330.0])
def test_pure_tone(freq):
    f0 = yin_f0(_tone(freq), SR, HOP)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.8 * len(f0)
    assert np.abs(np.median(voiced) - freq) / freq < 0.02


def test_unvoiced_noise_and_silence():
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(SR).astype(np.float32) * 0.1
    f0 = yin_f0(noise, SR, HOP)
    assert np.mean(f0 > 0) < 0.3  # mostly unvoiced
    assert (yin_f0(np.zeros(SR, np.float32), SR, HOP) == 0).all()


def test_pitch_step_tracks():
    x = np.concatenate([_tone(150, 0.5), _tone(300, 0.5)])
    f0 = yin_f0(x, SR, HOP)
    first, second = f0[: len(f0) // 2 - 2], f0[len(f0) // 2 + 2 :]
    assert np.abs(np.median(first[first > 0]) - 150) < 5
    assert np.abs(np.median(second[second > 0]) - 300) < 8


def test_native_matches_numpy():
    x = _tone(180, 0.4)
    a = yin_f0(x, SR, HOP)
    b = yin_f0_numpy(x, SR, HOP)
    # same algorithm; voiced decisions and values should agree closely
    both = (a > 0) & (b > 0)
    assert both.mean() > 0.8
    np.testing.assert_allclose(a[both], b[both], rtol=0.02)


def test_extract_f0_resamples_to_mel_length():
    x = _tone(200, 0.7)
    out = extract_f0(x, SR, HOP, n_frames=60)
    assert out.shape == (60,)
    assert np.abs(np.median(out[out > 0]) - 200) < 6
