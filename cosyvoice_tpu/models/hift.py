"""HiFT vocoder (NSF + iSTFT HiFi-GAN) — TPU-native re-implementation.

Mirrors the reference HiFTGenerator / CausalHiFTGenerator behavior
(cosyvoice/hifigan/generator.py:378-726) with channel-last layout and pure
functional inference:

  mel [B, T, 80] --f0 predictor--> f0 [B, T]
      --x480 upsample + harmonic SineGen--> source s [B, T*480]
      --STFT(16/4)--> 18-ch source spectrum, fused into the
      ConvTranspose/ResBlock(Snake) upsampling stack (8,5,3)
      --conv_post--> magnitude/phase --iSTFT--> wav [B, T*480]

All randomness (harmonic phases, source noise) comes from an explicit PRNG
key; pass the same key to reproduce the reference's fixed-buffer determinism
trick for streaming (generator.py:222-226,241-243,309-312).
"""

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cosyvoice_tpu.nn.activation import Snake
from cosyvoice_tpu.nn.conv import (
    CausalConv1d,
    CausalConv1dDownSample,
    CausalConv1dUpsample,
    Conv1d,
    WNConv1d,
    WNConvTranspose1d,
)
from cosyvoice_tpu.ops.resample import interpolate_linear, repeat_interleave_time
from cosyvoice_tpu.ops.stft import hann_window, istft, stft


def _ste_clip(x, lo, hi):
    """Straight-through clip: forward = jnp.clip(x, lo, hi) up to 1 ulp
    (the x + stop_grad(clip-x) form), backward = identity.

    A bit-exact custom_jvp variant (same gradients to float noise) was tried
    in r4 and REVERTED: the GAN generator pretrain is bistable at its working
    lr, and the 1-ulp forward difference deterministically flipped the
    default seed into the loud-noise plateau basin (hermetic run r5:
    mel-L1 parked at ~4.6 for 5000 steps vs 0.9 with this form; gradient
    diffs at init measured ~1e-7 relative — trajectory divergence, not a
    wrong derivative). The 1-ulp overshoot past the clamp bound is covered
    by the range test's tolerance instead."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: Tuple[int, ...] = (7, 7, 11)
    source_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    causal: bool = False
    conv_pre_look_right: int = 4  # causal variant only

    @property
    def hop_total(self) -> int:
        return int(np.prod(self.upsample_rates)) * self.istft_hop  # 480 @24k, 256 @22.05k

    @property
    def sinegen_type(self) -> str:
        # reference generator.py:422: '1' at 22.05 kHz (v1), '2' otherwise
        return "1" if self.sampling_rate == 22050 else "2"


class ConvRNNF0Predictor(nn.Module):
    """5x (WN conv k=3 pad=1 + ELU) + linear head, |.| (f0_predictor.py:23-60)."""

    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        x = mel
        for i in range(5):
            x = WNConv1d(self.cond_channels, 3, padding=1, name=f"condnet_{i}")(x)
            x = jax.nn.elu(x)
        return jnp.abs(nn.Dense(1, name="classifier")(x)[..., 0])


class CausalConvRNNF0Predictor(nn.Module):
    """Causal variant: right-causal k=4 first conv then 4 left-causal k=3
    (f0_predictor.py:62-103). finalize=False drops the lookahead frames."""

    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel: jax.Array, finalize: bool = True) -> jax.Array:
        first = CausalConv1d(self.cond_channels, 4, causal_type="right", weight_norm=True, name="condnet_0")
        if finalize:
            x = first(mel)
        else:
            pad = 3  # kernel_size 4 -> causal_padding 3
            x = first(mel[:, :-pad], cache=mel[:, -pad:])
        x = jax.nn.elu(x)
        for i in range(1, 5):
            x = CausalConv1d(self.cond_channels, 3, weight_norm=True, name=f"condnet_{i}")(x)
            x = jax.nn.elu(x)
        return jnp.abs(nn.Dense(1, name="classifier")(x)[..., 0])


# fixed causal-noise buffer length: 80 s at 24 kHz covers the longest single
# segment (<=80 text tokens * 20 max ratio = 64 s); positions wrap beyond
_FIXED_NOISE_SAMPLES = 80 * 24000


def sine_source_v1(
    rng: jax.Array,
    f0_up: jax.Array,
    cfg: HiFTConfig,
) -> Tuple[jax.Array, jax.Array]:
    """SineGen (type '1', generator.py:125-189): direct cumsum phase at the
    output rate with a uniform(-pi, pi) initial phase per harmonic (0 for the
    fundamental). f0_up: [B, L]. Returns (sine_waves [B, L, H+1], uv)."""
    H = cfg.nb_harmonics + 1
    B, L = f0_up.shape
    k_phase, k_noise = jax.random.split(rng)
    fn = f0_up[..., None] * jnp.arange(1, H + 1, dtype=f0_up.dtype) / cfg.sampling_rate  # [B, L, H]
    # phase accumulation mod 1 INSIDE the scan: a raw float32 cumsum reaches
    # ~5e4 cycles after 30 s where its ULP rivals the per-sample increment,
    # detuning high harmonics (the reference bounds the sum via its
    # cumsum_shift trick); addition mod 1 is associative so the scan stays
    # exact at any length
    cum_mod = jax.lax.associative_scan(lambda a, b: jnp.mod(a + b, 1.0), jnp.mod(fn, 1.0), axis=1)
    theta = 2.0 * np.pi * cum_mod
    phase = jax.random.uniform(k_phase, (B, 1, H), minval=-np.pi, maxval=np.pi).at[:, :, 0].set(0.0)
    sines = cfg.nsf_alpha * jnp.sin(theta + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(f0_up.dtype)[..., None]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sines.shape, sines.dtype)
    return sines * uv + noise, uv


def sine_source(
    rng: jax.Array,
    f0_up: jax.Array,
    cfg: HiFTConfig,
) -> Tuple[jax.Array, jax.Array]:
    """SineGen2-style harmonic source (generator.py:192-317, causal=False).

    f0_up: [B, L] fundamental at sample rate (L = T*480).
    Returns (sine_waves [B, L, H+1], uv [B, L, 1]).
    """
    H = cfg.nb_harmonics + 1
    B, L = f0_up.shape
    k_ini, k_noise = jax.random.split(rng)
    fn = f0_up[..., None] * jnp.arange(1, H + 1, dtype=f0_up.dtype)  # [B, L, H]
    rad = (fn / cfg.sampling_rate) % 1.0
    rand_ini = jax.random.uniform(k_ini, (B, H)).at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)
    # downsample rad to frame rate (linear), integrate, upsample phase back
    # (nearest in causal/streaming mode, matching generator.py:257)
    scale = cfg.hop_total
    rad_lo = interpolate_linear(jnp.swapaxes(rad, 1, 2), L // scale)  # [B, H, L/480]
    phase_lo = jnp.cumsum(rad_lo, axis=-1) * (2.0 * np.pi)
    if cfg.causal:
        phase = repeat_interleave_time(phase_lo * scale, scale, axis=-1)
    else:
        phase = interpolate_linear(phase_lo * scale, L)  # [B, H, L]
    sines = jnp.sin(jnp.swapaxes(phase, 1, 2))  # [B, L, H]

    uv = (f0_up > cfg.nsf_voiced_threshold).astype(f0_up.dtype)[..., None]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    if cfg.causal:
        # causal SineGen2 draws from a fixed POSITION-INDEXED uniform buffer
        # (generator.py:226,309-312) so the cumulative re-vocode emits a
        # bit-identical prefix as L grows. jax.random over an [L, H] shape is
        # NOT prefix-stable (threefry pairs counter halves of the whole
        # array), so draw a fixed-size buffer and slice by position.
        max_l = _FIXED_NOISE_SAMPLES
        buf = jax.random.uniform(jax.random.PRNGKey(7), (max_l, H), sines.dtype)
        idx = jnp.arange(L) % max_l  # wrap past the buffer (reference: 300 s)
        noise = noise_amp * buf[idx][None]
    else:
        noise = noise_amp * jax.random.normal(k_noise, sines.shape, sines.dtype)
    sine_waves = cfg.nsf_alpha * sines * uv + noise
    return sine_waves, uv


class SourceModuleHnNSF(nn.Module):
    """Merge harmonics to one excitation: tanh(linear(sines)) (generator.py:320-375)."""

    cfg: HiFTConfig

    @nn.compact
    def __call__(self, rng: jax.Array, f0_up: jax.Array) -> jax.Array:
        src = sine_source_v1 if self.cfg.sinegen_type == "1" else sine_source
        sine_waves, _ = src(rng, f0_up, self.cfg)
        sine_waves = jax.lax.stop_gradient(sine_waves)
        return jnp.tanh(nn.Dense(1, name="l_linear")(sine_waves))[..., 0]  # [B, L]


class ResBlock(nn.Module):
    """HiFiGAN/BigVGAN residual block with Snake activations
    (generator.py:46-122); causal mode uses left-causal convs."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    causal: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = Snake(self.channels, name=f"act1_{i}")(x)
            if self.causal:
                xt = CausalConv1d(self.channels, self.kernel_size, dilation=d, weight_norm=True, name=f"convs1_{i}")(xt)
            else:
                pad = (self.kernel_size * d - d) // 2
                xt = WNConv1d(self.channels, self.kernel_size, padding=pad, dilation=d, name=f"convs1_{i}")(xt)
            xt = Snake(self.channels, name=f"act2_{i}")(xt)
            if self.causal:
                xt = CausalConv1d(self.channels, self.kernel_size, weight_norm=True, name=f"convs2_{i}")(xt)
            else:
                pad = (self.kernel_size - 1) // 2
                xt = WNConv1d(self.channels, self.kernel_size, padding=pad, name=f"convs2_{i}")(xt)
            x = x + xt
        return x


class HiFTGenerator(nn.Module):
    """Full HiFT generator; `__call__` = decode(mel, source)."""

    cfg: HiFTConfig = field(default_factory=HiFTConfig)

    def setup(self):
        cfg = self.cfg
        if cfg.causal:
            self.f0_predictor = CausalConvRNNF0Predictor(cfg.base_channels)
        else:
            self.f0_predictor = ConvRNNF0Predictor(cfg.base_channels)
        self.m_source = SourceModuleHnNSF(cfg)

        if cfg.causal:
            self.conv_pre = CausalConv1d(
                cfg.base_channels, cfg.conv_pre_look_right + 1, causal_type="right", weight_norm=True
            )
        else:
            self.conv_pre = WNConv1d(cfg.base_channels, 7, padding=3)

        ups = []
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.base_channels // (2 ** (i + 1))
            if cfg.causal:
                ups.append(CausalConv1dUpsample(ch, k, u, name=f"ups_{i}"))
            else:
                ups.append(WNConvTranspose1d(ch, k, u, padding=(k - u) // 2, name=f"ups_{i}"))
        self.ups = ups

        downsample_cum = np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1]))[::-1]
        source_downs, source_resblocks = [], []
        for i, (u, k, d) in enumerate(
            zip(downsample_cum, cfg.source_resblock_kernel_sizes, cfg.source_resblock_dilations)
        ):
            ch = cfg.base_channels // (2 ** (i + 1))
            u = int(u)
            # source_downs are plain (non-weight-normed) convs in the
            # reference (generator.py:446-458)
            if u == 1:
                if cfg.causal:
                    source_downs.append(CausalConv1d(ch, 1, name=f"source_downs_{i}"))
                else:
                    source_downs.append(Conv1d(ch, 1, name=f"source_downs_{i}"))
            else:
                if cfg.causal:
                    source_downs.append(CausalConv1dDownSample(ch, u * 2, u, weight_norm=False, name=f"source_downs_{i}"))
                else:
                    source_downs.append(Conv1d(ch, u * 2, stride=u, padding=u // 2, name=f"source_downs_{i}"))
            source_resblocks.append(ResBlock(ch, k, d, causal=cfg.causal, name=f"source_resblocks_{i}"))
        self.source_downs = source_downs
        self.source_resblocks = source_resblocks

        resblocks = []
        for i in range(len(cfg.upsample_rates)):
            ch = cfg.base_channels // (2 ** (i + 1))
            for j, (k, d) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)):
                resblocks.append(ResBlock(ch, k, d, causal=cfg.causal, name=f"resblocks_{i * len(cfg.resblock_kernel_sizes) + j}"))
        self.resblocks = resblocks

        if cfg.causal:
            self.conv_post = CausalConv1d(cfg.istft_n_fft + 2, 7, weight_norm=True)
        else:
            self.conv_post = WNConv1d(cfg.istft_n_fft + 2, 7, padding=3)

    # ---------------- source STFT helpers ----------------
    def _stft(self, x):
        cfg = self.cfg
        spec = stft(x, cfg.istft_n_fft, cfg.istft_hop, hann_window(cfg.istft_n_fft))
        return jnp.real(spec), jnp.imag(spec)  # each [B, F, Ts]

    def _istft(self, magnitude, phase):
        cfg = self.cfg
        magnitude = _ste_clip(magnitude, None, 1e2)
        spec = magnitude * jnp.cos(phase) + 1j * (magnitude * jnp.sin(phase))
        return istft(spec, cfg.istft_n_fft, cfg.istft_hop, hann_window(cfg.istft_n_fft))

    # ---------------- core ----------------
    def decode(self, mel: jax.Array, s: jax.Array, finalize: bool = True) -> jax.Array:
        """mel: [B, T, 80]; s: [B, T*480] source. Returns wav [B, T*480]."""
        cfg = self.cfg
        sr, si = self._stft(s)
        if cfg.causal:
            if finalize:
                x = self.conv_pre(mel)
            else:
                la = cfg.conv_pre_look_right
                x = self.conv_pre(mel[:, :-la], cache=mel[:, -la:])
                trim = int(np.prod(cfg.upsample_rates)) * la
                sr, si = sr[:, :, :-trim], si[:, :, :-trim]
        else:
            x = self.conv_pre(mel)
        s_stft = jnp.swapaxes(jnp.concatenate([sr, si], axis=1), 1, 2)  # [B, Ts, 18]

        n_up = len(self.ups)
        for i in range(n_up):
            x = jax.nn.leaky_relu(x, negative_slope=cfg.lrelu_slope)
            x = self.ups[i](x)
            if i == n_up - 1:
                # reflection pad (1, 0) on time
                x = jnp.concatenate([x[:, 1:2], x], axis=1)
            si_x = self.source_downs[i](s_stft)
            si_x = self.source_resblocks[i](si_x)
            x = x + si_x
            nk = len(cfg.resblock_kernel_sizes)
            xs = None
            for j in range(nk):
                r = self.resblocks[i * nk + j](x)
                xs = r if xs is None else xs + r
            x = xs / nk

        x = jax.nn.leaky_relu(x, negative_slope=0.01)
        x = self.conv_post(x)  # [B, Tt, 18]
        x = jnp.swapaxes(x, 1, 2)  # [B, 18, Tt]
        n_half = cfg.istft_n_fft // 2 + 1
        # clamp BEFORE exp: forward-equivalent to the reference's
        # exp-then-clip-at-1e2 (generator.py:529-530) since
        # min(e^x, 100) == e^min(x, ln 100), but exp's gradient (= itself)
        # stays bounded instead of overflowing to inf (one x > 88 step NaNs
        # f32 training through the post-hoc clip otherwise). Straight-through
        # so an over-range magnitude still receives the corrective gradient.
        magnitude = jnp.exp(_ste_clip(x[:, :n_half, :], None, 4.6052))  # ln(100)
        phase = jnp.sin(x[:, n_half:, :])
        wav = self._istft(magnitude, phase)
        if cfg.causal and not finalize:
            wav = wav[:, : -int(np.prod(cfg.upsample_rates)) * cfg.istft_hop]
        # straight-through audio limiter: forward identical to the reference
        # clamp (generator.py:538), backward passes the gradient so training
        # from random init can recover from an amplitude overshoot instead of
        # parking on the clip rail where mel-loss gradients vanish (measured:
        # random-init runs rail at rms ~0.97 and stay there with a hard clip)
        return _ste_clip(wav, -cfg.audio_limit, cfg.audio_limit)

    def predict_f0(self, mel: jax.Array, finalize: bool = True) -> jax.Array:
        if self.cfg.causal:
            # reference promotes the causal f0 predictor to f64 for stream
            # stability (generator.py:715-717); on TPU we keep f32 here and
            # rely on the chunk==full tests to bound drift.
            return self.f0_predictor(mel, finalize=finalize)
        return self.f0_predictor(mel)

    def source_from_f0(self, rng: jax.Array, f0: jax.Array) -> jax.Array:
        """f0: [B, T] at mel rate -> source [B, T*480]."""
        f0_up = repeat_interleave_time(f0, self.cfg.hop_total, axis=-1)
        return self.m_source(rng, f0_up)

    def __call__(self, mel: jax.Array, rng: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Training forward: mel [B, T, 80] -> (wav [B, T*480], f0 [B, T])."""
        f0 = self.predict_f0(mel)
        s = self.source_from_f0(rng, f0)
        return self.decode(mel, s), f0

    def inference(
        self, mel: jax.Array, rng: jax.Array, cache_source: Optional[jax.Array] = None, finalize: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        """Streaming inference (generator.py:557-569): cache_source [B, Lc]
        overwrites the head of the freshly generated source to avoid phase
        glitches across chunks. Returns (wav, source)."""
        f0 = self.predict_f0(mel, finalize=finalize)
        s = self.source_from_f0(rng, f0)
        if cache_source is not None and cache_source.shape[1] > 0:
            lc = cache_source.shape[1]
            s = jnp.concatenate([cache_source, s[:, lc:]], axis=1)
        if self.cfg.causal and not finalize:
            # the causal f0 predictor consumed 3 lookahead mel frames
            # (its first conv is right-causal k=4); decode sees the same
            # trimmed view (reference generator.py:725).
            mel = mel[:, :-3]
        return self.decode(mel, s, finalize=finalize), s
