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
    """Slice [..., L] into hop-strided frames [..., T, frame_len] (no padding).

    When hop divides frame_len the framing is k = frame_len/hop overlapping
    reshape-views concatenated — pure slices, no gather (TPU gathers/scatters
    serialize; slices are free).
    """
    n_frames = 1 + (x.shape[-1] - frame_len) // hop
    if frame_len % hop == 0:
        k = frame_len // hop
        blocks = x[..., : (n_frames + k - 1) * hop].reshape(x.shape[:-1] + (n_frames + k - 1, hop))
        return jnp.concatenate([blocks[..., j : j + n_frames, :] for j in range(k)], axis=-1)
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
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    if n_fft % hop == 0:
        # overlap-add without scatter: frame slice [j*hop,(j+1)*hop) of frame t
        # lands contiguously at output offset (t+j)*hop, so each of the
        # k = n_fft/hop slice-groups is one zero-padded reshape + add.
        k = n_fft // hop
        sig = jnp.zeros((flat.shape[0], out_len), flat.dtype)
        for j in range(k):
            contrib = flat[:, :, j * hop : (j + 1) * hop].reshape(flat.shape[0], n_frames * hop)
            sig = sig + jnp.pad(contrib, ((0, 0), (j * hop, (k - 1 - j) * hop)))
        # window-square normalization with the same slice trick
        w2 = window * window
        wsq = jnp.zeros((out_len,), frames.dtype)
        for j in range(k):
            wsq = wsq + jnp.pad(jnp.tile(w2[j * hop : (j + 1) * hop], n_frames), (j * hop, (k - 1 - j) * hop))
        sig = sig / jnp.maximum(wsq, 1e-11)[None, :]
    else:
        idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
        sig = jnp.zeros((flat.shape[0], out_len), flat.dtype)
        sig = sig.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))
        wsq = jnp.zeros((out_len,), frames.dtype)
        wsq = wsq.at[idx.reshape(-1)].add(jnp.tile(window * window, (n_frames,)))
        sig = sig / jnp.maximum(wsq, 1e-11)[None, :]

    if center:
        sig = sig[:, n_fft // 2 : out_len - n_fft // 2]
    return sig.reshape(batch_shape + (sig.shape[-1],))
