"""Device helpers: fast param init on host CPU + transfer to accelerator.

Initializing large models directly on the (tunneled) TPU compiles huge
one-shot init programs (minutes); initializing on the CPU backend and
device_put-ing the pytree is much faster and avoids stressing the remote
compile path.
"""

from contextlib import contextmanager, nullcontext

import jax


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
