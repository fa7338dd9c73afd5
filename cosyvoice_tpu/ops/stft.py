"""STFT / iSTFT as pure XLA ops.

The reference vocoder (HiFT) runs torch.stft/istft with n_fft=16 hop=4 and a
periodic hann window (reference: cosyvoice/hifigan/generator.py:491-505). Here
the same semantics are expressed with jnp.fft.rfft over hop-strided frames so
XLA fuses framing, FFT and overlap-add into one program. For tiny n_fft (16)
XLA lowers the rfft to a dense matmul on the MXU, which is exactly what we
want on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic hann window, equal to scipy.signal.get_window('hann', n, fftbins=True)."""
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n), dtype=dtype)


def frame_signal(x: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """Slice [..., L] into hop-strided frames [..., T, frame_len] (no padding)."""
    n_frames = 1 + (x.shape[-1] - frame_len) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[..., idx]


def _reflect_pad_last(x: jax.Array, pad_left: int, pad_right: int) -> jax.Array:
    pad = [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)]
    return jnp.pad(x, pad, mode="reflect")


@partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def stft(x: jax.Array, n_fft: int, hop: int, window: jax.Array, center: bool = True):
    """torch.stft-compatible STFT.

    Args:
      x: [..., L] real signal.
      window: [n_fft] analysis window.
      center: reflect-pad n_fft//2 both sides first (torch default).

    Returns:
      complex spectrum [..., n_fft//2+1, T] with T = 1 + L//hop when center.
    """
    if center:
        x = _reflect_pad_last(x, n_fft // 2, n_fft // 2)
    frames = frame_signal(x, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


@partial(jax.jit, static_argnames=("n_fft", "hop", "center"))
def istft(spec: jax.Array, n_fft: int, hop: int, window: jax.Array, center: bool = True):
    """torch.istft-compatible inverse STFT (overlap-add with window-square norm).

    Args:
      spec: complex [..., n_fft//2+1, T].

    Returns:
      real signal [..., (T-1)*hop] when center=True (torch default length).
    """
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)  # [..., T, n_fft]
    frames = frames * window
    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)

    # overlap-add via scatter-add on a dilated reshape: frame t starts at t*hop
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    sig = jnp.zeros((flat.shape[0], out_len), flat.dtype)
    sig = sig.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))

    wsq = jnp.zeros((out_len,), frames.dtype)
    wsq = wsq.at[idx.reshape(-1)].add(jnp.tile(window * window, (n_frames,)))
    sig = sig / jnp.maximum(wsq, 1e-11)[None, :]

    if center:
        sig = sig[:, n_fft // 2 : out_len - n_fft // 2]
    return sig.reshape(batch_shape + (sig.shape[-1],))
