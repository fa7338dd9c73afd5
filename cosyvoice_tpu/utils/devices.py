"""Device helpers: fast param init on host CPU + transfer to accelerator.

Initializing large models directly on the (tunneled) TPU compiles huge
one-shot init programs (minutes); initializing on the CPU backend and
device_put-ing the pytree is much faster and avoids stressing the remote
compile path.
"""

from contextlib import contextmanager, nullcontext

import jax


def honor_env_platforms():
    """Re-apply an explicit JAX_PLATFORMS=cpu request.

    Accelerator plugins registered via sitecustomize (the axon PJRT tunnel
    here) force jax_platforms programmatically at interpreter start, which
    silently overrides the env var — a subprocess launched with
    JAX_PLATFORMS=cpu (hermetic tests, CPU smoke runs) would still dial the
    accelerator and hang if the tunnel is down. Call this at CLI entry
    points BEFORE any jax computation. Only the exact value "cpu" is
    honored: re-applying e.g. "axon" would drop the cpu backend that
    init_on_cpu relies on."""
    import os

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")


def cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


@contextmanager
def init_on_cpu():
    """Context: run param inits on CPU when the default backend is not CPU."""
    d = cpu_device()
    if d is not None and jax.default_backend() != "cpu":
        with jax.default_device(d):
            yield
    else:
        yield


def to_default_device(tree):
    """Move a pytree to the default (accelerator) device."""
    if jax.default_backend() == "cpu":
        return tree
    dev = jax.devices()[0]
    return jax.device_put(tree, dev)


def jit_init(init_fn, *args, **kwargs):
    """Run a flax `module.init` under jax.jit: one traced+compiled program
    instead of one eager op-compile per primitive. A plain eager init of even
    a tiny model issues ~1000 individual XLA compiles (~50-70 ms fixed cost
    each — minutes of wall time, and through the TPU tunnel also one network
    round trip each); jitted, the whole init is a single program. Positional
    args (rng, example inputs) are traced; kwargs (e.g. flax's `method=`)
    stay static in the closure."""
    return jax.jit(lambda *a: init_fn(*a, **kwargs))(*args)


def zeros_like_init(init_fn, *args, **kwargs):
    """Materialize an init's param pytree as on-device zeros without running it.

    `jax.eval_shape` gets the shape/dtype tree for free (abstract trace, no
    compute), then ONE jitted program creates the zero leaves directly on the
    default device. For benchmarking (where weight values don't change
    FLOPs/latency) this replaces minutes of host-side init + a multi-GB
    param transfer through the TPU tunnel with a sub-second device program.
    TPU matmul latency is data-independent, so zero weights time identically
    to trained ones; all downstream math (rmsnorm of 0, softmax of equal
    logits, CFM on zero mel) stays finite."""
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    build = jax.jit(lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes))
    return build()
