"""On-TPU stage breakdown of the token2wav path at production shapes.

Run on real hardware:
  python -m cosyvoice_tpu.tools.microbench_t2w

Times, each as its own chained jitted program (>=2 warm runs, value-fetch
sync — block_until_ready is a no-op through the axon tunnel):
  - flow encoder (upsample-conformer) forward
  - one CFM Euler step (estimator fwd, CFG batch-2) and the full 10-step solve
  - HiFT vocoder decode
  - the engine's fused whole-t2w program (what serving actually runs)
for a 5 s utterance (125 tokens, 250 mel frames) + 2 s prompt.
"""

import sys
import time

import numpy as np


def main():
    tiny = "--tiny" in sys.argv  # CPU smoke validation of the harness itself
    import jax

    if tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
    from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
    from cosyvoice_tpu.models.flow_matching import solve_euler
    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.runtime.engine import CosyVoice2Engine
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
    from cosyvoice_tpu.utils.devices import init_on_cpu, to_default_device

    def sync(x):
        if isinstance(x, (list, tuple)):
            return float(sum(jnp.sum(jnp.abs(v.astype(jnp.float32))) for v in x))
        return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))

    def timeit(name, fn, *args, reps=5):
        sync(fn(*args))
        sync(fn(*args))
        t0 = time.time()
        o = None
        for _ in range(reps):
            o = fn(*args)
        sync(o)
        dt = (time.time() - t0) / reps * 1000
        print(f"{name:<28}{dt:9.2f} ms")
        return dt

    K = jax.random.PRNGKey
    rng = np.random.default_rng(0)
    if tiny:
        from cosyvoice_tpu.models.flow_matching import CFMConfig

        flow = CausalFlow(FlowConfig(
            input_size=32, attention_heads=2, linear_units=64, num_blocks=1, num_up_blocks=1,
            estimator=EstimatorConfig(channels=(32,), attention_head_dim=8, n_blocks=1,
                                      num_mid_blocks=1, num_heads=2),
            cfm=CFMConfig(n_timesteps=2),
        ))
        hift = HiFTGenerator(HiFTConfig(
            base_channels=32, resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
            source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)),
        ))
    else:
        flow = CausalFlow(FlowConfig(dtype=jnp.bfloat16, estimator=EstimatorConfig(dtype=jnp.bfloat16)))
    if not tiny:
        hift = HiFTGenerator(HiFTConfig())
    with init_on_cpu():
        fp = flow.init(K(1))
        hp = hift.init(K(2), jnp.zeros((1, 8, 80)), K(3))
    fp, hp = to_default_device(fp), to_default_device(hp)

    n_tok, n_prompt = (10, 4) if tiny else (125, 50)
    L = n_tok + n_prompt
    Lpad = ((L + 31) // 32) * 32
    tok = np.zeros((1, Lpad), np.int32)
    tok[0, :L] = rng.integers(0, 6561, L)
    tok_j, tl_j = jnp.asarray(tok), jnp.asarray([L])
    pm = n_prompt * 2  # prompt mel frames (token:mel = 1:2)
    conds = np.zeros((1, Lpad * 2, 80), np.float32)
    conds[0, :pm] = rng.random((pm, 80)) * 2 - 12
    conds_j = jnp.asarray(conds)
    emb_j = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))

    c = flow.cfg

    @jax.jit
    def enc(fp, tok, tl):
        return flow.encoder.apply(fp["encoder"], tok, tl, None, streaming=False)[0]

    mu = enc(fp, tok_j, tl_j)
    spks = flow.encoder.apply(fp["encoder"], emb_j, method="project_spk")
    T = mu.shape[1]
    mask_f = jnp.ones((1, T), mu.dtype)
    z = jnp.asarray(rng.standard_normal((1, T, 80)).astype(np.float32)).astype(mu.dtype)

    @jax.jit
    def one_step(fp, z, mu):
        t = jnp.asarray(0.5, jnp.float32)
        return flow._estimator_apply(
            fp["estimator"],
            jnp.concatenate([z, z]),
            jnp.concatenate([mask_f, mask_f]),
            jnp.concatenate([mu, jnp.zeros_like(mu)]),
            jnp.stack([t, t]),
            jnp.concatenate([spks, jnp.zeros_like(spks)]),
            jnp.concatenate([conds_j[:, :T], jnp.zeros_like(conds_j[:, :T])]),
            False,
        )

    @jax.jit
    def full_solve(fp, z, mu):
        return solve_euler(flow._estimator_apply, fp["estimator"], z, mu, mask_f,
                           spks, conds_j[:, :T], c.cfm, streaming=False)

    @jax.jit
    def voc(hp, mel, key):
        return hift.apply(hp, mel, key, method="inference")[0]

    mel = full_solve(fp, z, mu)

    t_enc = timeit("flow encoder", enc, fp, tok_j, tl_j)
    t_step = timeit("CFM 1 euler step (CFG x2)", one_step, fp, z, mu)
    t_solve = timeit(f"CFM full solve ({c.cfm.n_timesteps} steps)", full_solve, fp, z, mu)
    t_voc = timeit("HiFT vocoder", voc, hp, mel, K(7))

    from cosyvoice_tpu.models.qwen2 import Qwen2Config

    lm_cfg = LMConfig(qwen=Qwen2Config(hidden_size=32, num_layers=1, num_heads=2, num_kv_heads=1,
                                       head_dim=16, intermediate_size=64, vocab_size=64,
                                       max_cache_len=64, dtype=jnp.float32)) if tiny else LMConfig()
    lm = Qwen2LM(lm_cfg)
    eng = CosyVoice2Engine(lm, flow, hift, None, fp, hp, token_bucket=32)
    t_fused = timeit(
        "fused t2w (serving path)",
        lambda: eng._jit_t2w_fused(fp, hp, tok_j, tl_j, conds_j, emb_j, K(9), prompt_mel_len=pm),
    )
    audio_s = n_tok / 25.0
    print(f"\nsum of stages: {t_enc + t_solve + t_voc:.2f} ms, fused: {t_fused:.2f} ms, "
          f"audio {audio_s:.1f}s -> t2w RTF {t_fused / 1000 / audio_s:.4f}")


if __name__ == "__main__":
    main()
