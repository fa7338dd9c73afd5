"""Training entry point (replaces cosyvoice/bin/train.py:40-195).

Single- or multi-host JAX training of one sub-model (llm | flow | hifigan).
Multi-host: jax.distributed.initialize (torchrun/NCCL equivalent); data is
sharded by (process_index, process_count) with dropped ragged tails so no
join barrier is needed (SURVEY §5.8).

Usage:
  python -m cosyvoice_tpu.bin.train --model llm --train_data data.list \
      --model_dir exp/llm [--checkpoint ckpt.msgpack] [--config config.json]
"""

import argparse
import json
import logging
import os
import random
from functools import partial

import jax
import numpy as np


def grouped(it, n: int):
    """Group an iterator into lists of n (ragged tail dropped) for
    gradient accumulation."""
    buf = []
    for item in it:
        buf.append(item)
        if len(buf) == n:
            yield buf
            buf = []


def build_pipeline(args, tokenizer, gan: bool = False, truncate_length: int = 24480):
    from cosyvoice_tpu.data import processor as P

    pipe = [
        P.parquet_opener,
        partial(P.tokenize, tokenizer=tokenizer),
        partial(P.filter_samples, max_length=args.max_length, token_max_length=200),
        partial(P.resample, resample_rate=args.sample_rate),
    ]
    if gan:
        pipe.append(partial(P.truncate, truncate_length=truncate_length))
    pipe += [
        partial(P.compute_fbank, sample_rate=args.sample_rate, hop=args.mel_hop),
    ]
    if gan:
        pipe.append(partial(P.compute_f0, sample_rate=args.sample_rate, hop_size=args.mel_hop))
    pipe += [
        partial(P.parse_embedding),
        partial(P.shuffle, shuffle_size=1000),
        partial(P.sort_by_len, sort_size=500),
        partial(P.batch, batch_type=args.batch_type, batch_size=args.batch_size,
                max_frames_in_batch=args.max_frames_in_batch),
        partial(P.padding, gan=gan, dpo=args.dpo),
    ]
    return pipe


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    # pre-parse --config so its "train" section becomes the argparse defaults
    # (explicit CLI flags still win), mirroring the reference's yaml-+-flags
    # layering (bin/train.py:106-112)
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default="")
    pre_args, _ = pre.parse_known_args()
    cfg = {}
    if pre_args.config:
        from cosyvoice_tpu.utils.config import load_config

        cfg = load_config(pre_args.config)

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="", help="JSON config (model sections + train defaults)")
    parser.add_argument("--model", required=True, choices=["llm", "flow", "hifigan"])
    parser.add_argument("--train_data", required=True)
    parser.add_argument("--cv_data", default="")
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--tokenizer_path", default="")
    parser.add_argument("--sample_rate", type=int, default=24000)
    parser.add_argument("--mel_hop", type=int, default=480)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--scheduler", default="warmuplr")
    parser.add_argument("--warmup_steps", type=int, default=2500)
    parser.add_argument("--grad_clip", type=float, default=5.0)
    parser.add_argument("--accum_grad", type=int, default=2)
    parser.add_argument("--max_epoch", type=int, default=200)
    parser.add_argument("--max_length", type=int, default=40960)
    parser.add_argument("--batch_type", default="dynamic")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--max_frames_in_batch", type=int, default=2000)
    parser.add_argument("--log_interval", type=int, default=100)
    parser.add_argument("--save_per_step", type=int, default=-1)
    parser.add_argument("--dpo", action="store_true")
    parser.add_argument("--seed", type=int, default=1986)
    parser.add_argument("--multihost", action="store_true", help="jax.distributed.initialize()")
    if cfg.get("train"):
        parser.set_defaults(**cfg["train"])
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    if args.multihost:
        jax.distributed.initialize()
    rank, world = jax.process_index(), jax.process_count()
    random.seed(args.seed)
    np.random.seed(args.seed)

    import optax

    from cosyvoice_tpu.data.dataset import Dataset
    from cosyvoice_tpu.frontend.tokenizer import get_tokenizer
    from cosyvoice_tpu.train.executor import Executor
    from cosyvoice_tpu.train.schedulers import get_scheduler
    from cosyvoice_tpu.train.trainer import make_flow_train_step, make_lm_train_step
    from cosyvoice_tpu.utils.devices import init_on_cpu, to_default_device

    tokenizer = get_tokenizer(args.tokenizer_path or None)
    # forward any scheduler-policy knobs the config's train section provided
    # (argparse set_defaults stores unknown keys as plain namespace attrs)
    sched_keys = ("hold_steps", "max_steps", "min_lr", "decay_rate", "d_model",
                  "decay_steps", "power", "cycle", "constant_steps")
    sched_conf = {k: getattr(args, k) for k in sched_keys if hasattr(args, k)}
    sched = get_scheduler(args.scheduler, args.lr, warmup_steps=args.warmup_steps, **sched_conf)
    optimizer = optax.chain(
        optax.clip_by_global_norm(args.grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_schedule(lambda s: -sched(s)),
    )
    key = jax.random.PRNGKey(args.seed)
    accum_used = 1  # set >1 by branches that implement scan-based accumulation

    version = int(cfg.get("version", 2))
    if args.model == "llm" and version == 1:
        from cosyvoice_tpu.models.llm_v1 import TransformerLM
        from cosyvoice_tpu.train.trainer import make_lm_v1_train_step
        from cosyvoice_tpu.utils.config import build_lm_v1_config

        lm = TransformerLM(build_lm_v1_config(cfg.get("llm")))
        with init_on_cpu():
            params = lm.init(key)
        params = to_default_device(params)
        if args.accum_grad > 1:
            logging.warning("accum_grad > 1 is not implemented for the v1 LM trainer; running without")
        step = make_lm_v1_train_step(lm.module, optimizer, lm.cfg.speech_token_size)
        from cosyvoice_tpu.train.losses import lm_ce_loss
        from cosyvoice_tpu.train.trainer import v1_lm_targets

        @jax.jit
        def cv_fn(p, mb):
            logits, _ = lm.module.apply(
                p, mb["text"], mb["text_len"], mb["spk"], mb["speech"], mb["speech_len"],
                method="forward_logits",
            )
            tgt = v1_lm_targets(lm.cfg.speech_token_size, mb["text"].shape[1], mb["text_len"],
                                mb["speech"], mb["speech_len"])
            return lm_ce_loss(logits, tgt)[0]

        def collate(b):
            return {
                "text": jax.numpy.asarray(b["text_token"]),
                "text_len": jax.numpy.asarray(b["text_token_len"]),
                "spk": jax.numpy.asarray(b["embedding"]),
                "speech": jax.numpy.asarray(b["speech_token"]),
                "speech_len": jax.numpy.asarray(b["speech_token_len"]),
            }

        pipeline = build_pipeline(args, tokenizer)
    elif args.model == "llm":
        from cosyvoice_tpu.models.llm import Qwen2LM
        from cosyvoice_tpu.train.lm_data import collate_lm_batch
        from cosyvoice_tpu.utils.config import build_lm_config

        lm = Qwen2LM(build_lm_config(cfg.get("llm")))
        with init_on_cpu():
            params = lm.init(key)
        params = to_default_device(params)
        accum = accum_used = max(args.accum_grad, 1)
        step = make_lm_train_step(lm.module, optimizer, accum_steps=accum)
        from cosyvoice_tpu.train.losses import IGNORE_ID, lm_ce_loss

        @jax.jit
        def cv_fn(p, mb):
            mb = {k: v[0] for k, v in mb.items()}  # drop the accum axis
            logits = lm.module.apply(p, mb["ids"], mb["types"], mb["lengths"], method="forward_logits")
            return lm_ce_loss(logits, mb["targets"])[0]

        def collate(batch_group):
            """Stack A collated microbatches to [A, B, T] (pad rows get
            length 1 + all-IGNORE targets so they are loss- and
            NaN-neutral); a bare dict (CV path) is treated as A=1."""
            groups = batch_group if isinstance(batch_group, list) else [batch_group]
            mbs = [collate_lm_batch(lm.cfg, b) for b in groups]
            A = len(mbs)
            B = max(m["ids"].shape[0] for m in mbs)
            T = max(m["ids"].shape[1] for m in mbs)
            out = {
                "ids": np.zeros((A, B, T), np.int32),
                "types": np.full((A, B, T), 1, np.int32),
                "targets": np.full((A, B, T), IGNORE_ID, np.int32),
                "lengths": np.ones((A, B), np.int32),
            }
            for a, m in enumerate(mbs):
                b_, t_ = m["ids"].shape
                out["ids"][a, :b_, :t_] = m["ids"]
                out["types"][a, :b_, :t_] = m["types"]
                out["targets"][a, :b_, :t_] = m["targets"]
                out["lengths"][a, :b_] = m["lengths"]
            return {k: jax.numpy.asarray(v) for k, v in out.items()}

        pipeline = build_pipeline(args, tokenizer)
    elif args.model == "flow" and version == 1:
        from cosyvoice_tpu.models.flow_v1 import MaskedDiffFlow
        from cosyvoice_tpu.utils.config import build_flow_v1_config

        flow = MaskedDiffFlow(build_flow_v1_config(cfg.get("flow")))
        with init_on_cpu():
            params = flow.init(key)
        params = to_default_device(params)
        loss_jit = jax.jit(flow.loss)

        def v1_flow_step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(
                lambda p: loss_jit(p, rng, batch["token"], batch["token_len"], batch["feat"],
                                   batch["feat_len"], batch["embedding"])
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, {"loss": loss}

        def step(params, opt_state, batch, step_no):
            return v1_flow_step(params, opt_state, batch, jax.random.fold_in(key, int(step_no)))

        def cv_fn(p, mb):
            return loss_jit(p, jax.random.PRNGKey(0), mb["token"], mb["token_len"], mb["feat"],
                            mb["feat_len"], mb["embedding"])

        def collate(b):
            return {
                "token": jax.numpy.asarray(b["speech_token"]),
                "token_len": jax.numpy.asarray(b["speech_token_len"]),
                "feat": jax.numpy.asarray(b["speech_feat"]),
                "feat_len": jax.numpy.asarray(b["speech_feat_len"]),
                "embedding": jax.numpy.asarray(b["embedding"]),
            }

        pipeline = build_pipeline(args, tokenizer)
    elif args.model == "flow":
        from cosyvoice_tpu.models.flow import CausalFlow
        from cosyvoice_tpu.utils.config import build_flow_config

        flow = CausalFlow(build_flow_config(cfg.get("flow")))
        with init_on_cpu():
            params = flow.init(key)
        params = to_default_device(params)
        accum = accum_used = max(args.accum_grad, 1)
        flow_step = make_flow_train_step(flow, optimizer, accum_steps=accum)

        def step(params, opt_state, batch, step_no):
            streaming = random.random() < 0.5  # unified training (flow.py:201)
            return flow_step(params, opt_state, batch, jax.random.fold_in(key, int(step_no)), streaming)

        cv_loss_jit = jax.jit(flow.loss, static_argnames=("streaming",))

        def cv_fn(p, mb):
            if accum > 1:  # CV collate also stacks; take microbatch 0
                mb = {k: v[0] for k, v in mb.items()}
            return cv_loss_jit(p, jax.random.PRNGKey(0), mb["token"], mb["token_len"], mb["feat"],
                               mb["feat_len"], mb["embedding"], streaming=False)

        def _one(b):
            return {
                "token": np.asarray(b["speech_token"]),
                "token_len": np.asarray(b["speech_token_len"]),
                "feat": np.asarray(b["speech_feat"]),
                "feat_len": np.asarray(b["speech_feat_len"]),
                "embedding": np.asarray(b["embedding"]),
            }

        def collate(batch_group):
            if accum == 1 and not isinstance(batch_group, list):
                return {k: jax.numpy.asarray(v) for k, v in _one(batch_group).items()}
            groups = batch_group if isinstance(batch_group, list) else [batch_group]
            mbs = [_one(b) for b in groups]
            A = len(mbs)
            B = max(m["token"].shape[0] for m in mbs)
            L = max(m["token"].shape[1] for m in mbs)
            Tm = max(m["feat"].shape[1] for m in mbs)
            out = {
                "token": np.zeros((A, B, L), np.int32),
                "token_len": np.ones((A, B), np.int32),
                "feat": np.zeros((A, B, Tm, 80), np.float32),
                "feat_len": np.full((A, B), 2, np.int32),
                "embedding": np.zeros((A, B, mbs[0]["embedding"].shape[-1]), np.float32),
            }
            for a, m in enumerate(mbs):
                b_ = m["token"].shape[0]
                out["token"][a, :b_, : m["token"].shape[1]] = m["token"]
                out["token_len"][a, :b_] = m["token_len"]
                out["feat"][a, :b_, : m["feat"].shape[1]] = m["feat"]
                out["feat_len"][a, :b_] = m["feat_len"]
                out["embedding"][a, :b_] = m["embedding"]
            return {k: jax.numpy.asarray(v) for k, v in out.items()}

        pipeline = build_pipeline(args, tokenizer)
    else:  # hifigan: dual-optimizer GAN loop (reference executor.py:85-144)
        import jax.numpy as jnp

        from cosyvoice_tpu.models.discriminator import MultipleDiscriminator
        from cosyvoice_tpu.models.hift import HiFTGenerator
        from cosyvoice_tpu.train.gan import GanLossConfig, make_gan_train_steps
        from cosyvoice_tpu.utils.config import build_hift_config

        hift = HiFTGenerator(build_hift_config(cfg.get("hift")))
        # optional "gan" config section: discriminator widths + clip length
        # (the reference hardcodes both, hifigan.yaml; tiny hermetic/CI runs
        # shrink them)
        gan_cfg = cfg.get("gan", {})
        truncate_length = int(gan_cfg.get("truncate_length", 24480))
        disc = MultipleDiscriminator(
            mpd_channels=tuple(gan_cfg.get("mpd_channels", (32, 128, 512, 1024))),
            mrd_resolutions=tuple(
                tuple(r) for r in gan_cfg.get("mrd_resolutions", ((1024, 120), (2048, 240), (512, 50)))
            ),
        )
        with init_on_cpu():
            gen_params = hift.init(key, jnp.zeros((1, 8, 80)), key)
            disc_params = disc.init(key, jnp.zeros((1, truncate_length)))
        # resume: accept either a {"generator","discriminator"} GAN checkpoint
        # or a bare generator tree (a converted pretrained hift.msgpack)
        if args.checkpoint and os.path.exists(args.checkpoint):
            import flax.serialization as ser

            with open(args.checkpoint, "rb") as f:
                blob = f.read()
            try:
                both = ser.from_bytes({"generator": gen_params, "discriminator": disc_params}, blob)
                gen_params, disc_params = both["generator"], both["discriminator"]
                logging.info("resumed GAN checkpoint %s", args.checkpoint)
            except Exception:  # noqa: BLE001 — generator-only checkpoint
                gen_params = ser.from_bytes(gen_params, blob)
                logging.info("resumed generator-only checkpoint %s", args.checkpoint)
        elif args.checkpoint:
            logging.warning("checkpoint %s not found; training hifigan from scratch", args.checkpoint)
        gen_params = to_default_device(gen_params)
        disc_params = to_default_device(disc_params)
        # gan config knobs: adversarial lr (reference hifigan yaml 2e-4),
        # optional generator-only warmup phase (mel+F0 regression at a higher
        # lr — the role of the reference recipe's pretrained-hift init), and
        # a gan-specific batch size (smaller batches = more optimizer steps
        # per epoch on tiny corpora)
        gan_lr = float(gan_cfg.get("lr", 2e-4))
        pretrain_steps = int(gan_cfg.get("pretrain_steps", 0))
        pretrain_lr = float(gan_cfg.get("pretrain_lr", 1e-3))
        if "batch_size" in gan_cfg:
            args.batch_size = int(gan_cfg["batch_size"])
        # clip-5 parity with the reference trainer, which routes GAN updates
        # through the same update_parameter_and_lr clip as llm/flow
        # (utils/executor.py:85-144 -> train_utils.py:291-320); without it
        # conv_post gradients (maxabs ~2e3 on overfit corpora) NaN the game
        g_opt = optax.chain(optax.clip_by_global_norm(args.grad_clip), optax.adam(gan_lr))
        d_opt = optax.chain(optax.clip_by_global_norm(args.grad_clip), optax.adam(gan_lr))
        loss_cfg = GanLossConfig(sample_rate=args.sample_rate, mel_hop=args.mel_hop)
        gen_step, disc_step = make_gan_train_steps(hift, disc, g_opt, d_opt, loss_cfg)
        g_state, d_state = g_opt.init(gen_params), d_opt.init(disc_params)

        dataset = Dataset(
            args.train_data,
            build_pipeline(args, tokenizer, gan=True, truncate_length=truncate_length),
            rank=rank, world_size=world,
        )

        if pretrain_steps > 0:
            from cosyvoice_tpu.train.gan import make_generator_pretrain_step

            # warmup->cosine: a constant pretrain lr is init-seed fragile —
            # some seeds explode conv_post within ~100 steps and park on a
            # flat loud-noise plateau (mel-L1 ~4.6 for thousands of steps);
            # 500 warmup steps let the stack organize at a low lr first
            # (measured: seed 1986 stuck at mel 4.6 with constant 1e-3,
            # reaches mel 0.95 in 2000 steps with this schedule)
            import jax as _jax

            # The pretrain basin is BISTABLE at the working lr: some
            # (seed, bit-trajectory) combinations explode conv_post early and
            # park on a flat loud-noise plateau (mel-L1 ~4.6 indefinitely —
            # observed flipping on 1-ulp forward changes, see
            # models/hift.py:_ste_clip). Detect the plateau at a probe step
            # and RESTART from a fresh init fold at half the lr instead of
            # burning the whole budget in the bad basin.
            probe_at = max(200, min(1200, pretrain_steps // 4))
            plateau_mel = 3.0
            max_attempts = 3
            init_backup = gen_params
            for attempt in range(max_attempts):
                lr_a = pretrain_lr * (0.5 ** attempt)
                p_sched = optax.warmup_cosine_decay_schedule(
                    0.0, lr_a, min(500, max(1, pretrain_steps // 4)),
                    pretrain_steps, lr_a / 5.0,
                )
                p_opt = optax.chain(optax.clip_by_global_norm(args.grad_clip), optax.adam(p_sched))
                if attempt > 0:
                    with init_on_cpu():
                        gen_params = hift.init(
                            _jax.random.fold_in(key, 555_000 + attempt), jnp.zeros((1, 8, 80)), key
                        )
                    gen_params = to_default_device(gen_params)
                p_state = p_opt.init(gen_params)
                p_step = make_generator_pretrain_step(hift, p_opt, loss_cfg)
                done, ep, pm = 0, 0, None
                mel_recent: list = []
                diverged = False

                while done < pretrain_steps and not diverged:
                    dataset.set_epoch(10_000 + ep)  # disjoint from the GAN phase's epochs
                    ep += 1
                    epoch_had_batches = False
                    for b in iter(dataset):
                        epoch_had_batches = True
                        batch = {
                            "speech": _jax.numpy.asarray(b["speech"]),
                            "speech_feat": _jax.numpy.asarray(b["speech_feat"]),
                            "pitch_feat": _jax.numpy.asarray(b["pitch_feat"]),
                        }
                        gen_params, p_state, pm = p_step(
                            gen_params, p_state, batch, _jax.random.fold_in(key, 77_000 + done)
                        )
                        done += 1
                        if done % args.log_interval == 0:
                            logging.info("gan pretrain step %d loss=%.4f mel=%.4f", done,
                                         float(pm["loss"]), float(pm["mel"]))
                        if done % 50 == 0:
                            mel_recent.append(float(pm["mel"]))
                            mel_recent = mel_recent[-5:]
                        if (
                            done >= probe_at
                            and attempt < max_attempts - 1
                            and len(mel_recent) >= 3
                            and min(mel_recent) > plateau_mel
                        ):
                            logging.warning(
                                "gan pretrain attempt %d in the plateau basin at step %d "
                                "(recent mel %.2f); restarting from a fresh init at lr %.2e",
                                attempt, done, float(np.mean(mel_recent)), lr_a * 0.5,
                            )
                            diverged = True
                            break
                        if done >= pretrain_steps:
                            break
                    if not epoch_had_batches:
                        # empty shard for this rank: spinning forever here would
                        # hang the job silently
                        logging.warning("gan pretrain: dataset yielded no batches; stopping at %d steps", done)
                        break
                if not diverged:
                    break
            del init_backup
            if pm is not None:
                logging.info("generator pretrain done: %d steps, final mel=%.4f", done, float(pm["mel"]))
        # model_name matches the recipes' --model_name hifigan in averaging
        executor = Executor(lambda *a: a, args.model_dir, model_name="hifigan",
                            log_interval=args.log_interval, rank=rank)
        import jax as _jax

        step_no = 0
        for epoch in range(args.max_epoch):
            dataset.set_epoch(epoch)
            gen_losses = []
            for b in iter(dataset):
                batch = {
                    "speech": _jax.numpy.asarray(b["speech"]),
                    "speech_feat": _jax.numpy.asarray(b["speech_feat"]),
                    "pitch_feat": _jax.numpy.asarray(b["pitch_feat"]),
                }
                k = _jax.random.fold_in(key, step_no)
                gen_params, g_state, gm = gen_step(gen_params, g_state, disc_params, batch, k)
                disc_params, d_state, dm = disc_step(disc_params, d_state, gen_params, batch, k)
                step_no += 1
                gen_losses.append(float(gm["loss"]))
                if step_no % args.log_interval == 0:
                    logging.info("gan step %d gen=%.4f disc=%.4f", step_no, float(gm["loss"]), float(dm["loss"]))
            if rank == 0:
                executor.epoch = epoch + 1
                executor.step = step_no
                # epoch-mean generator loss stands in for cv_loss so best-N
                # averaging works (GAN losses have no held-out CV analog)
                executor.save(
                    {"generator": gen_params, "discriminator": disc_params},
                    (g_state, d_state),
                    {"cv_loss": float(np.mean(gen_losses)) if gen_losses else float("inf")},
                )
        return

    dataset = Dataset(args.train_data, pipeline, rank=rank, world_size=world)
    cv_dataset = Dataset(args.cv_data, pipeline, rank=rank, world_size=world) if args.cv_data else None
    cv_iter_fn = (lambda: iter(cv_dataset)) if cv_dataset is not None else None
    executor = Executor(
        step, args.model_dir, model_name=args.model, log_interval=args.log_interval,
        save_per_step=args.save_per_step, rank=rank,
    )
    if args.checkpoint:
        params = executor.resume(params, args.checkpoint)
    opt_state = optimizer.init(params)
    if executor.step > 0:
        # resume the LR schedule at the restored global step (the reference's
        # scheduler.set_step, scheduler.py:70-72); Adam moments stay fresh
        # like the reference's DDP resume, which saves the model only
        opt_state = tuple(
            optax.ScaleByScheduleState(count=jax.numpy.asarray(executor.step, jax.numpy.int32))
            if isinstance(s, optax.ScaleByScheduleState) else s
            for s in opt_state
        )

    # snapshot init before training (reference bin/train.py:156-159)
    if rank == 0:
        executor.save(params, opt_state, {"note": "init"})
    for epoch in range(args.max_epoch):
        dataset.set_epoch(epoch)
        train_iter = grouped(iter(dataset), accum_used) if accum_used > 1 else iter(dataset)
        params, opt_state = executor.train_one_epoch(
            params, opt_state, train_iter, collate, cv_fn=cv_fn, cv_iter=cv_iter_fn
        )
        if rank == 0:
            cv_metrics = (
                executor.cross_validate(params, cv_fn, cv_iter_fn, collate) if cv_dataset is not None else None
            )
            executor.save(params, opt_state, cv_metrics)


if __name__ == "__main__":
    main()
