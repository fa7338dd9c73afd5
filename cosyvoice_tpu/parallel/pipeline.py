"""Pipeline parallelism (GPipe schedule) over a `pp` mesh axis.

The reference scales only with DDP/ZeRO-2 (SURVEY §2.6); on TPU pods an
additional pipeline axis lets the layer stack span chips whose interconnect
hop is cheap (ICI neighbors) without weight gathering. This module implements
the TPU-native version: `shard_map` over a `pp` mesh axis, per-stage layer
slabs (the stacked layer params are sharded on their leading layer axis), a
`lax.scan` bubble schedule, and `ppermute` ring shifts between stages —
forward AND backward (reverse-mode through `ppermute`/`scan` yields the
reverse pipeline schedule automatically, so one `jax.grad` gives pipelined
training).

Works for any homogeneous layer stack; the Qwen2 decoder adapter used by the
training demo is `qwen2_layer_fn`.
"""

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_layer_params(layer_trees):
    """[per-layer param trees] -> one tree with a leading layer axis
    (leaves [L, ...]). Layers must be structurally identical."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_trees)


def shard_stacked_layers(mesh: Mesh, stacked, axis: str = "pp"):
    """Place a stacked layer tree with the leading layer axis split across
    the `pp` mesh axis (each stage holds L/pp contiguous layers)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), stacked
    )


def pipeline_forward(mesh: Mesh, layer_fn, stacked, x, bcast=(), n_micro: int = 2,
                     axis: str = "pp"):
    """Run a homogeneous layer stack as a `pp`-staged pipeline.

    mesh:     mesh containing the `axis` dimension (other axes untouched).
    layer_fn: (one_layer_params, h, *bcast) -> h, applied layer-by-layer
              inside each stage via lax.scan over the stage's layer slab.
    stacked:  stack_layer_params output; leading axis L, L % pp == 0,
              sharded over `axis` (see shard_stacked_layers).
    x:        [B, ...] activations; B % n_micro == 0.
    bcast:    replicated extras passed to every layer (rope tables, masks).

    Returns [B, ...] outputs (replicated). Differentiable: jax.grad through
    this function produces the reverse pipeline schedule.
    """
    pp = mesh.shape[axis]
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    xm = x.reshape(n_micro, mb, *x.shape[1:])
    steps = n_micro + pp - 1

    def stage(local_params, xm, *bc):
        idx = jax.lax.axis_index(axis)

        def body(carry, t):
            buf, out = carry
            # stage 0 ingests microbatch t (clamped re-runs after the tail
            # are discarded by the bounded output writes below)
            inject = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
            )
            h = jnp.where(idx == 0, inject, buf)

            def one_layer(hc, lp):
                return layer_fn(lp, hc, *bc), None

            h, _ = jax.lax.scan(one_layer, h, local_params)
            h_next = jax.lax.ppermute(h, axis, [(i, (i + 1) % pp) for i in range(pp)])
            # the LAST stage's step-t result is microbatch t-(pp-1)
            w = t - (pp - 1)
            upd = jax.lax.dynamic_update_index_in_dim(out, h, jnp.clip(w, 0, n_micro - 1), 0)
            out = jnp.where((idx == pp - 1) & (w >= 0), upd, out)
            return (h_next, out), None

        buf0 = jnp.zeros_like(xm[0])
        out0 = jnp.zeros_like(xm)
        (_, out), _ = jax.lax.scan(body, (buf0, out0), jnp.arange(steps))
        # replicate the last stage's outputs to every stage
        out = jnp.where(idx == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis)

    fn = shard_map(
        stage,
        mesh=mesh,
        in_specs=(P(axis), P(), *([P()] * len(bcast))),
        out_specs=P(),
        check_vma=False,
    )
    out = fn(stacked, xm, *bcast)
    return out.reshape(B, *x.shape[1:])


def qwen2_layer_fn(cfg):
    """Adapter: one Qwen2 decoder layer as (params, h, cos, sin, bias) -> h
    for pipeline_forward (training forward, no KV cache)."""
    from cosyvoice_tpu.models.qwen2 import Qwen2Layer

    layer = Qwen2Layer(cfg)

    def fn(lp, h, cos, sin, bias):
        out, _ = layer.apply({"params": lp}, h, cos, sin, bias)
        return out

    return fn
