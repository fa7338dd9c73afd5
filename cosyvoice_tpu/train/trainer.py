"""pjit training steps over a jax.sharding.Mesh.

TPU-native replacement for the reference's DDP/DeepSpeed trainer
(cosyvoice/bin/train.py, utils/train_utils.py, utils/executor.py):

- one Mesh ('dp', 'tp'); batch sharded on dp; Megatron-style tp on the LM
  (see cosyvoice_tpu/parallel/sharding.py) — XLA inserts psums/all-gathers
- grad clip 5.0 + non-finite-grad skip (train_utils.py:305-315)
- grad accumulation expressed as lax.scan over microbatches
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from cosyvoice_tpu.parallel.sharding import lm_param_spec, named_sharding, param_specs
from cosyvoice_tpu.train.losses import lm_ce_loss


@dataclass
class TrainState:
    params: dict
    opt_state: tuple
    step: jax.Array


def make_optimizer(lr: float = 1e-4, warmup_steps: int = 2500, grad_clip: float = 5.0,
                   scheduler: str = "warmuplr", **sched_conf):
    from cosyvoice_tpu.train.schedulers import get_scheduler

    # all policies in schedulers.py are jnp-traceable, so the schedule works
    # inside the jitted optimizer update
    sched = get_scheduler(scheduler, lr, warmup_steps=warmup_steps, **sched_conf)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -sched(s)),
    )


def skip_nonfinite(updates, opt_state, old_opt_state, grads_finite):
    """Skip the optimizer step when the grad norm is non-finite."""
    updates = jax.tree_util.tree_map(lambda u: jnp.where(grads_finite, u, jnp.zeros_like(u)), updates)
    opt_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(grads_finite, new, old) if hasattr(new, "shape") else new,
        opt_state,
        old_opt_state,
    )
    return updates, opt_state


def make_lm_train_step(lm_module, optimizer, mesh=None, accum_steps: int = 1):
    """Returns jitted step(params, opt_state, batch, step) -> (params,
    opt_state, metrics).

    batch: {'ids': [A, B, T], 'types': [A, B, T], 'targets': [A, B, T],
    'lengths': [A, B]} with A = accum_steps microbatches (A=1 => no accum).
    """

    def loss_fn(params, mb):
        logits = lm_module.apply(params, mb["ids"], mb["types"], mb["lengths"], method="forward_logits")
        loss, acc = lm_ce_loss(logits, mb["targets"])
        return loss, acc

    def step_fn(params, opt_state, batch, step):
        def micro(carry, mb):
            grads_acc, loss_acc, acc_acc = carry
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
            grads_acc = jax.tree_util.tree_map(lambda a, g: a + g, grads_acc, grads)
            return (grads_acc, loss_acc + loss, acc_acc + acc), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        (grads, loss, acc), _ = jax.lax.scan(micro, (zero_grads, 0.0, 0.0), batch)
        inv = 1.0 / accum_steps
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        updates, new_opt_state = skip_nonfinite(updates, new_opt_state, opt_state, finite)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss * inv, "acc": acc * inv, "grad_norm": gnorm, "step": step + 1}
        return params, new_opt_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0, 1))

    # GSPMD: the caller places params/opt_state/batch on the mesh (see
    # parallel.sharding.shard_params / shard_batch); jit infers shardings from
    # the committed inputs and XLA inserts the collectives.
    return jax.jit(step_fn, donate_argnums=(0, 1))


def v1_lm_targets(speech_token_size, text_pad_len, text_len, speech, speech_len):
    """Targets for TransformerLMModule.forward_logits: position 2+text_len
    (the task slot) predicts speech[0], ..., position 2+text_len+speech_len
    predicts EOS (= speech_token_size); everything else IGNORE_ID
    (reference llm.py:107-110). Spans the packed padded length
    S = 2 + text_pad + 1 + speech_pad to match the logits."""
    from cosyvoice_tpu.train.losses import IGNORE_ID

    S = 3 + text_pad_len + speech.shape[1]
    pos = jnp.arange(S)[None, :]
    k = pos - (2 + text_len[:, None])  # index into the speech sequence
    in_speech = (k >= 0) & (k < speech_len[:, None])
    gathered = jnp.take_along_axis(speech, jnp.clip(k, 0, speech.shape[1] - 1), axis=1)
    tgt = jnp.where(in_speech, gathered, IGNORE_ID)
    return jnp.where(k == speech_len[:, None], speech_token_size, tgt)


def make_lm_v1_train_step(lm_module, optimizer, speech_token_size: int):
    """v1 TransformerLM CE training step. batch: {'text': [B, Lt], 'text_len',
    'spk': [B, 192], 'speech': [B, Ls], 'speech_len'}."""

    def step_fn(params, opt_state, batch, step):
        def loss_fn(p):
            logits, _ = lm_module.apply(
                p, batch["text"], batch["text_len"], batch["spk"], batch["speech"],
                batch["speech_len"], method="forward_logits",
            )
            tgt = v1_lm_targets(
                speech_token_size, batch["text"].shape[1], batch["text_len"],
                batch["speech"], batch["speech_len"],
            )
            return lm_ce_loss(logits, tgt)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        updates, new_opt_state = skip_nonfinite(updates, new_opt_state, opt_state, finite)
        params = optax.apply_updates(params, updates)
        return params, new_opt_state, {"loss": loss, "acc": acc, "grad_norm": gnorm, "step": step + 1}

    return jax.jit(step_fn, donate_argnums=(0, 1))


def make_flow_train_step(flow, optimizer, mesh=None, accum_steps: int = 1):
    """Flow CFM training step (data-parallel). batch keys: token, token_len,
    feat, feat_len, embedding — with a leading accum axis A when
    accum_steps > 1 (lax.scan over microbatches, like the LM step);
    `streaming` is sampled per-step by the caller (unified training,
    flow.py:201)."""

    def loss_fn(params, mb, rng, streaming):
        return flow.loss(
            params, rng, mb["token"], mb["token_len"], mb["feat"], mb["feat_len"],
            mb["embedding"], streaming=streaming,
        )

    def step_fn(params, opt_state, batch, rng, streaming):
        if accum_steps == 1:
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng, streaming)
        else:
            def micro(carry, mb_rng):
                mb, r = mb_rng
                grads_acc, loss_acc = carry
                mb_loss, g = jax.value_and_grad(loss_fn)(params, mb, r, streaming)
                return (jax.tree_util.tree_map(lambda a, b: a + b, grads_acc, g), loss_acc + mb_loss), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            rngs = jax.random.split(rng, accum_steps)
            (grads, loss), _ = jax.lax.scan(micro, (zero, 0.0), (batch, rngs))
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss = loss * inv
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(gnorm)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        updates, new_opt_state = skip_nonfinite(updates, new_opt_state, opt_state, finite)
        params = optax.apply_updates(params, updates)
        return params, new_opt_state, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(step_fn, static_argnames=("streaming",), donate_argnums=(0, 1))
