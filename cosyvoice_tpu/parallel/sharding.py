"""Mesh + sharding rules (GSPMD/pjit) for training and serving.

The reference scales with DDP + DeepSpeed ZeRO-2 over NCCL
(cosyvoice/bin/train.py:58-62, utils/train_utils.py:94-108). The TPU-native
equivalent is a single jax.sharding.Mesh with:

- 'dp'  : data parallel (batch axis)
- 'tp'  : tensor parallel (attention heads / MLP hidden / vocab) — megatron
          style column->row sharding so each block needs one psum, inserted
          automatically by XLA from the param/activation shardings.

Optimizer state inherits the param sharding; adding a 'dp'-sharded fsdp
variant (ZeRO-3 analog) is a spec change, not a code change.
"""

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if tp is None:
        tp = 1 if n == 1 else (2 if n % 2 == 0 else 1)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


# param-path regex -> PartitionSpec for Dense kernels [in, out] / embeds [V, D]
_LM_RULES = [
    (r"embed_tokens.*embedding", P("tp", None)),
    (r"speech_embedding.*embedding", P("tp", None)),
    (r"(qkv_proj|q_proj|k_proj|v_proj|gate_up_proj|gate_proj|up_proj).*kernel", P(None, "tp")),
    (r"(o_proj|down_proj).*kernel", P("tp", None)),
    (r"llm_decoder.*kernel", P(None, "tp")),
    (r"(qkv_proj|q_proj|k_proj|v_proj|gate_up_proj|gate_proj|up_proj).*bias", P("tp")),
    (r"llm_decoder.*bias", P("tp")),
]


def lm_param_spec(path: str, leaf, mesh: Optional[Mesh] = None) -> P:
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh is not None else {}

    def fits(spec: P) -> bool:
        for dim, ax in enumerate(spec):
            if ax is not None and leaf.shape[dim] % axis_sizes.get(ax, 1) != 0:
                return False
        return True

    for pat, spec in _LM_RULES:
        if re.search(pat, path) and len(spec) <= leaf.ndim and fits(spec):
            return spec
    return P()  # replicated


def fsdp_param_spec(path: str, leaf, mesh: Optional[Mesh] = None, min_size: int = 1 << 14) -> P:
    """FSDP/ZeRO-3 analog (the veRL-GRPO FSDP role, SURVEY §2.6): the weights
    themselves are sharded along 'dp' on the largest divisible free axis, on
    top of any tp rule; XLA inserts the per-layer all-gathers from the spec
    (GSPMD), so this composes with the existing train steps unchanged.
    Small params (< min_size elements) stay replicated — the all-gather
    latency would dominate their memory savings."""
    base = lm_param_spec(path, leaf, mesh)
    if leaf.ndim == 0 or leaf.size < min_size or mesh is None:
        return base
    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("dp", 1)
    if dp == 1:
        return base
    dims = list(base) + [None] * (leaf.ndim - len(base))
    if "dp" in dims:
        return base
    free = [i for i in range(leaf.ndim) if dims[i] is None and leaf.shape[i] % dp == 0]
    if not free:
        return P(*dims)
    dims[max(free, key=lambda i: leaf.shape[i])] = "dp"
    return P(*dims)


def shard_params_fsdp(mesh: Mesh, params):
    return shard_params(mesh, params, rule=fsdp_param_spec)


def _flatten_path(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def param_specs(params, rule=lm_param_spec, mesh: Optional[Mesh] = None):
    return jax.tree_util.tree_map_with_path(lambda p, x: rule(_flatten_path(p), x, mesh), params)


def named_sharding(mesh: Mesh, spec_tree):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), spec_tree, is_leaf=lambda x: isinstance(x, P)
    )


def shard_params(mesh: Mesh, params, rule=lm_param_spec):
    """Place a param pytree onto the mesh according to the rules."""
    specs = param_specs(params, rule, mesh)
    return jax.device_put(params, named_sharding(mesh, specs))


def batch_spec() -> P:
    return P("dp")


def shard_batch(mesh: Mesh, batch):
    """Shard every array leaf's leading batch axis over 'dp'. Leaves with an
    extra leading microbatch (accum) axis shard axis 1 instead."""

    def place(x):
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[0] = "dp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, batch)


def shard_accum_batch(mesh: Mesh, batch):
    """Like shard_batch but axis 0 is the grad-accum axis: shard axis 1."""

    def place(x):
        spec = [None] * x.ndim
        if x.ndim >= 2:
            spec[1] = "dp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, batch)


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_opt_state_zero(mesh: Mesh, opt_state, params, rule=lm_param_spec):
    """ZeRO-style optimizer-state sharding (the DeepSpeed stage-2 analog,
    reference train_utils.py:101-108): adam moments of replicated params are
    sharded along 'dp' on their first divisible axis; moments of tp-sharded
    params keep the param sharding (optax zeros_like already inherits it)."""
    dp = dict(zip(mesh.axis_names, mesh.devices.shape))["dp"]
    param_shapes = {id(l): True for l in jax.tree_util.tree_leaves(params)}  # noqa: F841

    pspecs = param_specs(params, rule, mesh)
    flat_specs = {tuple(l.shape): s for (s, l) in zip(jax.tree_util.tree_leaves(pspecs, is_leaf=lambda x: isinstance(x, P)), jax.tree_util.tree_leaves(params))}

    def place(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        spec = flat_specs.get(tuple(leaf.shape))
        if spec is not None and any(ax is not None for ax in spec):
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        # replicated param -> shard moment along dp on the first divisible axis
        for dim, n in enumerate(leaf.shape):
            if n % dp == 0:
                ax = [None] * leaf.ndim
                ax[dim] = "dp"
                return jax.device_put(leaf, NamedSharding(mesh, P(*ax)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, opt_state)


# ---------------------------------------------------------------------------
# inference-side parallelism (the vLLM TP / Triton multi-GPU serving role:
# reference vllm/cosyvoice2.py:64-75, README.Cosyvoice2.DiT.md:104-124).
# Megatron-style tp over heads/MLP plus dp over request slots; XLA inserts the
# per-block psum from the param/activation shardings.
# ---------------------------------------------------------------------------


def cache_spec(cache_leaf, mesh: Mesh) -> P:
    """KV arena [L, B, T, Hkv, d]: batch over 'dp', kv heads over 'tp' when
    divisible, else replicated on that axis."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dims = [None] * cache_leaf.ndim
    if cache_leaf.ndim == 5:
        if cache_leaf.shape[1] % sizes.get("dp", 1) == 0:
            dims[1] = "dp"
        if cache_leaf.shape[3] % sizes.get("tp", 1) == 0:
            dims[3] = "tp"
    elif cache_leaf.ndim == 3:
        # int8-KV scale plane [L, B, T]: batch over 'dp'
        if cache_leaf.shape[1] % sizes.get("dp", 1) == 0:
            dims[1] = "dp"
    return P(*dims)


def shard_lm_serving(mesh: Mesh, params, cache):
    """Place LM params (Megatron tp rules) and the KV arena onto the mesh for
    multi-chip decode. The jitted prefill/decode programs pick up the
    shardings from their inputs (GSPMD propagation)."""
    params = shard_params(mesh, params)
    cache = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, cache_spec(x, mesh))), cache
    )
    return params, cache
