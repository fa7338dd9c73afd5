"""On-TPU microbenchmark: batched (continuous-batching) LM decode blocks,
A/B-ing the flash-decode attention kernel against the masked full-arena
einsum (COSY_FLASH_DECODE), across batch sizes and arena lengths.

The ragged decode block is the serving hot loop (runtime/batch_scheduler.py,
the vLLM role in the reference — cosyvoice/cli/model.py:281-290). Its HBM
traffic = weights + KV arena reads; the flash kernel (ops/decode_attention)
makes the arena term proportional to the LIVE length instead of the arena
capacity.

Run on real hardware:
  python -m cosyvoice_tpu.tools.microbench_batch_decode [--block 25] [--reps 8]
"""

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=25)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--quant", default=False, help="weight quant: int8 | int4 | int4p")
    ap.add_argument("--kv_quant", action="store_true", help="int8 KV arena")
    args = ap.parse_args()
    if args.quant in ("0", "", "False", "false"):
        args.quant = False

    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()

    import jax
    import jax.numpy as jnp

    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.utils.devices import init_on_cpu, to_default_device

    K = jax.random.PRNGKey

    def sync(x):
        # true device sync: fetch a scalar reduce — block_until_ready is a
        # no-op through the axon tunnel (see bench.py timing methodology)
        if isinstance(x, (list, tuple)):
            x = x[0]
        float(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32))))

    def time_block(model, params, B, arena_len, live_len, block, reps):
        c = model.cfg
        cache = model.init_cache(B, length=arena_len)
        pack = model._decode_pack(params, cache)
        cur = jnp.full((B,), live_len, jnp.int32)
        # stagger the live lengths like a real continuous batch
        cur = cur - jnp.arange(B, dtype=jnp.int32) * (live_len // max(1, 2 * B))
        logits = jnp.zeros((B, c.head_size), jnp.float32)
        rec = jnp.full((B, c.win_size), -1, jnp.int32)
        nd = jnp.zeros((B,), jnp.int32)
        ml = jnp.full((B,), 10_000, jnp.int32)
        fin = jnp.zeros((B,), bool)
        o = model._jit_decode_block(
            params, K(1), cache, cur, logits, rec, nd, ml, fin, block,
            ragged=True, stacked=pack)
        sync(o[0])
        o = model._jit_decode_block(
            params, K(2), o[2], cur, logits, rec, nd, ml, fin, block,
            ragged=True, stacked=pack)
        sync(o[0])
        t0 = time.time()
        for i in range(reps):
            o = model._jit_decode_block(
                params, K(3 + i), o[2], cur, logits, rec, nd, ml, fin, block,
                ragged=True, stacked=pack)
        sync(o[0])
        return (time.time() - t0) / reps

    import dataclasses

    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    qwen = dataclasses.replace(Qwen2Config(), quant=args.quant, kv_quant=args.kv_quant)
    lm = Qwen2LM(LMConfig(block_size=args.block, qwen=qwen))
    with init_on_cpu():
        params = lm.init(K(0))
    params = to_default_device(params)
    sync(jax.tree_util.tree_leaves(params)[0])

    grid = [(1, 512, 400), (4, 1024, 900), (8, 1024, 900), (8, 2048, 1900), (16, 2048, 1900)]
    print(f"block={args.block} quant={args.quant} kv_quant={args.kv_quant} "
          f"flash={os.environ.get('COSY_FLASH_DECODE', 'auto')}")
    for B, arena, live in grid:
        dt = time_block(lm, params, B, arena, live, args.block, args.reps)
        per_tok = dt / args.block
        print(f"B={B:3d} arena={arena:5d} live~{live:5d}: "
              f"{dt * 1e3:7.2f} ms/block  {per_tok * 1e3:6.3f} ms/step  "
              f"{B / per_tok:8.0f} tok/s")


if __name__ == "__main__":
    main()
