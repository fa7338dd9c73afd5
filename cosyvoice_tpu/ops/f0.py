"""F0 extraction: native C++ YIN (csrc/f0_yin.cc) with a numpy fallback.

The reference computes training F0 with pyworld harvest/dio + stonemask
(cosyvoice/dataset/processor.py:200-222). pyworld is not in this image; the
native YIN estimator (cumulative-mean-normalized difference + parabolic
refinement) fills that role for the GAN pipeline's F0 loss
(hifigan/hifigan.py:60-63) and is ~100x faster than the old per-frame numpy
autocorrelation loop.
"""

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_SRC, "libf0_yin.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False  # cache failure: don't re-spawn g++ per sample
_warned_fallback = False


def _build_lib() -> str:
    src = os.path.join(_SRC, "f0_yin.cc")
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return _SO
    if os.environ.get("COSY_F0_NO_BUILD"):
        raise RuntimeError("native f0 lib missing and COSY_F0_NO_BUILD set")
    # atomic build: compile to a pid-unique temp then rename, so concurrent
    # first-use builds (multi-process data pipelines on a shared checkout)
    # never CDLL a partially written file
    tmp = f"{_SO}.{os.getpid()}.tmp"
    subprocess.check_call(["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp])
    os.replace(tmp, _SO)
    return _SO


def _get_lib() -> ctypes.CDLL:
    global _lib, _build_failed
    if _build_failed:
        raise RuntimeError("native f0 build failed earlier in this process")
    if _lib is None:
        try:
            lib = ctypes.CDLL(_build_lib())
        except Exception:
            _build_failed = True
            raise
        lib.yin_f0.restype = ctypes.c_int
        lib.yin_f0.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
    return _lib


def yin_f0(
    wav: np.ndarray,
    sample_rate: int,
    hop: int,
    frame: Optional[int] = None,
    fmin: float = 60.0,
    fmax: float = 500.0,
    threshold: float = 0.15,
) -> np.ndarray:
    """Per-frame F0 (Hz, 0 = unvoiced) at hop spacing. wav: [n] float."""
    wav = np.ascontiguousarray(np.asarray(wav, np.float32).reshape(-1))
    n_frames = max(len(wav) // hop, 0)
    out = np.zeros(n_frames, np.float32)
    if n_frames == 0:
        return out
    lib = _get_lib()
    lib.yin_f0(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav), sample_rate, hop,
        frame or 4 * hop, fmin, fmax, threshold,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_frames,
    )
    return out


def yin_f0_numpy(
    wav: np.ndarray,
    sample_rate: int,
    hop: int,
    frame: Optional[int] = None,
    fmin: float = 60.0,
    fmax: float = 500.0,
    threshold: float = 0.15,
) -> np.ndarray:
    """Vectorized numpy YIN (same algorithm) — fallback when g++ is absent."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    frame = frame or 4 * hop
    tau_min = int(sample_rate / fmax)
    tau_max = min(int(sample_rate / fmin), frame - 1)
    n_frames = len(wav) // hop
    f0 = np.zeros(n_frames, np.float32)
    for fidx in range(n_frames):
        start = fidx * hop
        w = frame if start + frame + tau_max < len(wav) else len(wav) - start - tau_max - 1
        if w < tau_max:
            continue
        x = wav[start : start + w + tau_max]
        if np.mean(x[:w] ** 2) < 1e-8:
            continue
        taus = np.arange(1, tau_max + 1)
        # d[tau] = ||x[:w] - x[tau:tau+w]||^2, via sliding windows
        d = np.asarray([np.sum((x[:w] - x[t : t + w]) ** 2) for t in taus])
        dn = d * taus / np.maximum(np.cumsum(d), 1e-12)
        dn = np.concatenate([[1.0], dn])
        tau_est = -1
        below = np.nonzero(dn[tau_min : tau_max] < threshold)[0]
        if len(below):
            tau = tau_min + below[0]
            while tau + 1 <= tau_max - 1 and dn[tau + 1] < dn[tau]:
                tau += 1
            tau_est = tau
        else:
            tau = tau_min + int(np.argmin(dn[tau_min : tau_max + 1]))
            if dn[tau] < 2.0 * threshold:
                tau_est = tau
        if tau_est < 0:
            continue
        tau_ref = float(tau_est)
        if tau_min < tau_est < tau_max:
            a, b, c = dn[tau_est - 1], dn[tau_est], dn[tau_est + 1]
            denom = a - 2 * b + c
            if abs(denom) > 1e-12:
                shift = 0.5 * (a - c) / denom
                if -1 < shift < 1:
                    tau_ref += shift
        f0[fidx] = sample_rate / tau_ref
    return f0


def extract_f0(wav: np.ndarray, sample_rate: int, hop: int, n_frames: int) -> np.ndarray:
    """F0 resampled to n_frames (the reference linearly interpolates pyworld's
    track to the mel length, processor.py:221)."""
    try:
        f0 = yin_f0(wav, sample_rate, hop)
    except Exception:
        global _warned_fallback
        if not _warned_fallback:
            import logging

            logging.warning("native YIN unavailable; using the ~100x slower numpy fallback")
            _warned_fallback = True
        f0 = yin_f0_numpy(wav, sample_rate, hop)
    if len(f0) == 0:
        return np.zeros(n_frames, np.float32)
    if len(f0) == n_frames:
        return f0
    xp = np.linspace(0.0, 1.0, len(f0))
    xq = np.linspace(0.0, 1.0, n_frames)
    return np.interp(xq, xp, f0).astype(np.float32)
