"""Persistent XLA compilation cache for long-lived entrypoints.

The reference ships compiled artifacts (TRT engines, torch JIT exports —
cosyvoice/bin/export_jit.py / export_onnx.py) so a serving process starts
warm. The TPU-native equivalent is the JAX persistent compilation cache:
every jitted program (LM prefill/decode blocks, fused streaming-chunk
programs, batched-arena decode) is persisted after its first compile, and a
restarted server — or the driver's bench — loads it back instead of paying
XLA compile time again (hundreds of seconds for the full surface on a
small-host rig).

Call `enable_persistent_cache()` BEFORE building any model; it is what
`serving/http_server.py`, `serving/grpc_server.py`, `bin/aot_warmup.py` and
`bench.py` share.

Entries are keyed on HLO + compile options by JAX itself, so correctness is
unaffected; we additionally key the *directory* by the host's CPU feature
flags because XLA's CPU AOT entries embed the compile machine's feature set
(loading one built on a different host logs "could lead to execution errors
such as SIGILL"), and this rig migrates between machines across sessions.
"""

import hashlib
import os


def default_cache_dir() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = ""
    host_key = hashlib.sha256(flags.encode()).hexdigest()[:12]
    return os.path.join(root, f".jax_cache_{host_key}")


def enable_persistent_cache(cache_dir: str = "") -> str:
    """Point JAX's compilation cache at a persistent dir and return it.

    Precedence: explicit arg > $COSY_COMPILE_CACHE > repo-local host-keyed
    default. Set COSY_COMPILE_CACHE=0 to disable entirely (returns "").
    """
    env = os.environ.get("COSY_COMPILE_CACHE", "")
    if env == "0":
        return ""
    cache_dir = cache_dir or env or default_cache_dir()

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # 0.5 s floor: catches every model-scale program while skipping the
    # thousands of trivial one-op compiles that would bloat the dir.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
