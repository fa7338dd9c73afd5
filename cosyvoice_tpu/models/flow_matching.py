"""Optimal-transport conditional flow matching: fused Euler/CFG solver.

Re-derivation of cosyvoice/flow/flow_matching.py:21-227 as a pure function:
the 10-step Euler loop with classifier-free guidance runs as one lax.scan over
a batch-doubled estimator call — the whole mel synthesis is a single XLA
program (the TPU answer to the reference's TensorRT engine).

Determinism: the causal variant draws its noise from a fixed seeded buffer
(reference flow_matching.py:199-200) so chunked and offline synthesis see the
same z; here a host-side seeded gaussian buffer is materialized once.
"""

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CFMConfig:
    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    training_cfg_rate: float = 0.2
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10


@lru_cache(maxsize=4)
def fixed_noise_buffer(n_mels: int = 80, max_len: int = 15000) -> np.ndarray:
    """Seeded z buffer [max_len, n_mels] (reference: rand_noise[1,80,50*300])."""
    return np.random.RandomState(0).randn(max_len, n_mels).astype(np.float32)


def t_span_cosine(n_timesteps: int) -> np.ndarray:
    t = np.linspace(0.0, 1.0, n_timesteps + 1, dtype=np.float32)
    return (1.0 - np.cos(t * 0.5 * np.pi)).astype(np.float32)


def solve_euler(
    estimator_apply,
    estimator_params,
    z: jax.Array,
    mu: jax.Array,
    mask: jax.Array,
    spks: jax.Array,
    cond: jax.Array,
    cfg: CFMConfig,
    streaming: bool = False,
) -> jax.Array:
    """Run the CFG Euler ODE from noise z to mel.

    z/mu/cond: [B, T, 80]; mask: [B, T]; spks: [B, 80]. Returns [B, T, 80].

    Per step the conditional and unconditional branches are packed into one
    batch-of-2B estimator call (reference solve_euler:95-117), so the MXU sees
    one large matmul stream instead of two launches.
    """
    B = z.shape[0]
    t_span = jnp.asarray(t_span_cosine(cfg.n_timesteps))
    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]

    mask2 = jnp.concatenate([mask, mask], axis=0)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    r = cfg.inference_cfg_rate

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * B,), t, x.dtype)
        out = estimator_apply(estimator_params, x2, mask2, mu2, t2, spks2, cond2, streaming)
        dphi = (1.0 + r) * out[:B] - r * out[B:]
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z, (ts, dts))
    return x


def solve_euler_chunk(
    estimator_apply_chunk,
    estimator_params,
    z: jax.Array,
    mu: jax.Array,
    spks: jax.Array,
    cond: jax.Array,
    cfg: CFMConfig,
    caches,
    pos,
    real_n,
) -> tuple:
    """Incremental-chunk CFG Euler: one chunk's trajectory, with per-step
    estimator caches (KV arenas + conv caches) carried between chunks.

    z/mu/cond: [B, n, 80] — the NEW chunk only (z sliced from the fixed
    noise buffer at the chunk's absolute mel offset). caches: pytree whose
    leaves carry a leading [n_timesteps] axis (one estimator state per Euler
    step — each step's trajectory x_t differs, so each needs its own arena).
    The scan consumes step i's cache as xs and emits the updated one as ys:
    chunk cost is O(chunk * prefix) attention instead of the full-recompute
    O(prefix^2). Returns (mel_chunk [B, n, 80], new caches).

    estimator_apply_chunk(params, x2, mu2, t2, spks2, cond2, cache, pos,
    real_n) -> (field [2B, n, 80], new_cache).
    """
    B = z.shape[0]
    t_span = jnp.asarray(t_span_cosine(cfg.n_timesteps))
    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    r = cfg.inference_cfg_rate

    def step(x, inp):
        (t, dt), cache_t = inp
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * B,), t, x.dtype)
        out, cache_t = estimator_apply_chunk(
            estimator_params, x2, mu2, t2, spks2, cond2, cache_t, pos, real_n
        )
        dphi = (1.0 + r) * out[:B] - r * out[B:]
        return x + dt * dphi, cache_t

    x, caches = jax.lax.scan(step, z, ((ts, dts), caches))
    return x, caches


def cfm_loss(
    estimator_apply,
    estimator_params,
    rng: jax.Array,
    x1: jax.Array,
    mask: jax.Array,
    mu: jax.Array,
    spks: jax.Array,
    cond: jax.Array,
    cfg: CFMConfig,
    streaming: bool = False,
):
    """Training loss (reference compute_loss:155-193): sample t~U, OT path
    y = (1-(1-sigma)t) z + t x1, target u = x1 - (1-sigma) z, masked MSE.
    Returns (loss, y)."""
    B = x1.shape[0]
    k_t, k_z, k_cfg = jax.random.split(rng, 3)
    # training t is PLAIN uniform by design: the reference's cosine
    # t_scheduler warps only the inference t_span (flow_matching.py:176,225)
    t = jax.random.uniform(k_t, (B, 1, 1), x1.dtype)
    z = jax.random.normal(k_z, x1.shape, x1.dtype)
    y = (1.0 - (1.0 - cfg.sigma_min) * t) * z + t * x1
    u = x1 - (1.0 - cfg.sigma_min) * z

    if cfg.training_cfg_rate > 0:
        keep = (jax.random.uniform(k_cfg, (B,)) > cfg.training_cfg_rate).astype(x1.dtype)
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    pred = estimator_apply(estimator_params, y, mask, mu, t[:, 0, 0], spks, cond, streaming)
    m = mask[..., None]
    loss = jnp.sum(jnp.square((pred - u) * m)) / (jnp.sum(mask) * x1.shape[-1] + 1e-8)
    return loss, y
