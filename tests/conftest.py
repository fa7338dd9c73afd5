import os

# The session env pins JAX_PLATFORMS=axon (one real TPU chip via the axon
# PJRT plugin, registered in sitecustomize which also force-updates
# jax_platforms programmatically). The test suite must run hermetically on an
# 8-device virtual CPU mesh, so (1) set XLA_FLAGS before any backend
# initializes and (2) override the jax_platforms config AFTER importing jax —
# env vars alone are not enough because the plugin's register() calls
# jax.config.update("jax_platforms", "axon,cpu").
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("COSY_TEST_PLATFORM", "cpu"))

# Persistent XLA compile cache for the suite: compile time dominates the gate
# on a small-host rig (the models are tiny; the programs are many), and the
# same programs recompile on every pytest invocation. The cache is keyed on
# HLO + compile options, so correctness is unaffected; min_compile_time=0.3 s
# catches the mid-size programs that add up. First (cold) run pays full
# compile; every rerun of the fast gate is then compile-free.
#
# The dir is additionally keyed by the host's CPU flags: XLA's CPU AOT cache
# entries embed the compile machine's feature set, and loading an entry built
# on a different host logs "could lead to execution errors such as SIGILL" —
# this rig migrates between machines across sessions, so a flag-keyed dir
# guarantees every host compiles (once) for itself.
if os.environ.get("COSY_TEST_NO_CACHE", "") != "1":
    import hashlib

    try:
        with open("/proc/cpuinfo") as _f:
            _flags = next((ln for ln in _f if ln.startswith("flags")), "")
    except OSError:
        _flags = ""
    _host_key = hashlib.sha256(_flags.encode()).hexdigest()[:12]
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                              f".jax_cache_tests_{_host_key}")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
