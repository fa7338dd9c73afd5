"""Host-side audio IO (wav load/save + resample), dependency-light.

Replaces the reference's torchaudio.load path (utils/file_utils.py:44-50)
with stdlib `wave` + scipy polyphase resampling.
"""

import wave
from fractions import Fraction

import numpy as np
from scipy.signal import resample_poly


def load_wav(path: str, target_sr: int) -> np.ndarray:
    """Load a wav file, mix to mono, resample to target_sr. Returns [1, L] float32 in [-1, 1]."""
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sr != target_sr:
        frac = Fraction(target_sr, sr).limit_denominator(1000)
        x = resample_poly(x, frac.numerator, frac.denominator).astype(np.float32)
    return x[None, :]


def save_wav(path: str, wav: np.ndarray, sr: int) -> None:
    """wav: [1, L] or [L] float in [-1, 1]."""
    wav = np.asarray(wav).reshape(-1)
    pcm = np.clip(wav * 32767.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())
