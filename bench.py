"""Benchmark: CosyVoice2-0.5B-class offline synthesis RTF on one TPU chip.

Measures the full token->wav pipeline (LM block decode + flow 10-step CFM +
HiFT vocoder) at production shapes with randomly initialized weights (weights
don't change FLOPs/latency). Prints ONE JSON line:

  {"metric": "offline_rtf", "value": <rtf>, "unit": "ratio",
   "vs_baseline": <baseline_rtf / rtf>, ...extras}

Baseline: reference CosyVoice2 offline RTF 0.0891 @ conc=1 on 1x L20 with
Triton+TRT-LLM (BASELINE.md). vs_baseline > 1 means faster than baseline.

Timing methodology (this rig's TPU sits behind the axon network tunnel):
- jax block_until_ready() does NOT synchronize through the tunnel; every
  timed section ends with a device-side scalar reduce + host fetch.
- the first 1-2 executions of a fresh executable pay a lazy program-upload
  cost, so every program is warmed up with >=2 fully-synced runs.
- one host fetch costs a tunnel round trip (measured and subtracted where a
  section can't amortize it over reps).
"""

import json
import time

import numpy as np

_T_START = time.time()  # the optional-section deadline counts from process start


def _sync(x):
    """True device sync: fetch a scalar reduce of x (block_until_ready is a
    no-op through the axon tunnel)."""
    import jax.numpy as jnp

    if isinstance(x, (list, tuple)):
        return float(sum(jnp.sum(jnp.abs(v.astype(jnp.float32))) for v in x))
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


def main():
    import os

    import jax

    # persistent XLA compilation cache: the heavy first-run compiles (0.5B LM
    # prefill/decode scan, flow conformer+CFM, vocoder) are reused across
    # bench invocations
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # tunnel watchdog: a dead axon tunnel makes jax.devices() hang FOREVER
    # (the client redials indefinitely); emit a diagnostic JSON line instead
    # of hanging the driver's bench step
    import threading as _threading

    probe_done = _threading.Event()

    def _probe():
        jax.devices()
        probe_done.set()

    _threading.Thread(target=_probe, daemon=True).start()
    if not probe_done.wait(timeout=float(os.environ.get("COSY_BENCH_PROBE_S", "300"))):
        print(json.dumps({
            "metric": "offline_rtf", "value": -1.0, "unit": "ratio", "vs_baseline": 0.0,
            "error": "tpu tunnel unreachable (jax.devices() hung past probe timeout)",
        }))
        os._exit(2)

    import jax.numpy as jnp

    from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
    from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
    from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
    from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT
    from cosyvoice_tpu.runtime.engine import CosyVoice2Engine
    from cosyvoice_tpu.utils.devices import zeros_like_init

    K = jax.random.PRNGKey
    rng = np.random.default_rng(0)

    n_tokens = 125  # 5 s of audio at 25 Hz
    audio_seconds = n_tokens / 25.0

    lm = Qwen2LM(LMConfig(block_size=125))
    flow = CausalFlow(FlowConfig(dtype=jnp.bfloat16, estimator=EstimatorConfig(dtype=jnp.bfloat16)))
    hift = HiFTGenerator(HiFTConfig())

    # weight VALUES don't change FLOPs/latency, so params are materialized as
    # on-device zeros from eval_shape — replaces the r2 init path (CPU-side
    # flax init of 0.5B + ~2 GB device_put through the tunnel = 494 s init_s)
    # with sub-second device programs
    t0 = time.time()
    lm_params = zeros_like_init(lm.init, K(0))
    flow_params = zeros_like_init(flow.init, K(1))
    hift_params = zeros_like_init(hift.init, K(2), jnp.zeros((1, 8, 80)), K(3))
    _sync(jax.tree_util.tree_leaves(lm_params)[0])
    init_s = time.time() - t0
    print(f"# init {init_s:.1f}s", flush=True)

    engine = CosyVoice2Engine(lm, flow, hift, lm_params, flow_params, hift_params, token_bucket=32)

    # measure the tunnel round trip (fetch of an already-ready scalar)
    ready = jnp.zeros(())
    _sync(ready)
    rts = []
    for _ in range(5):
        t0 = time.time()
        _sync(ready)
        rts.append(time.time() - t0)
    rt_s = float(np.median(rts))

    # ---- inputs ----
    text_len = 30
    prompt_speech_tokens = rng.integers(0, 6561, 50).astype(np.int32)
    prompt_feat = (rng.random((1, 100, 80)).astype(np.float32) * 2 - 12).astype(np.float32)
    embedding = rng.standard_normal((1, 192)).astype(np.float32)
    text = rng.integers(0, 150000, text_len).astype(np.int32)

    c = lm.cfg
    ids = np.concatenate([[c.sos_id], text, [c.task_id], prompt_speech_tokens]).astype(np.int32)
    types = np.concatenate(
        [[TYPE_SPECIAL], np.full(text_len, TYPE_TEXT), [TYPE_SPECIAL], np.full(50, TYPE_SPEECH)]
    ).astype(np.int32)
    pad_T = 128
    ids_d = np.zeros((1, pad_T), np.int32); ids_d[0, : len(ids)] = ids
    types_d = np.full((1, pad_T), 1, np.int32); types_d[0, : len(types)] = types
    arena = lm.arena_bucket(pad_T + n_tokens + 1)  # bucketed KV arena (512 here)

    def lm_block_time(model, params, block, n_rep=4):
        """Prefill once, run the decode-block program warm, time n_rep chained
        blocks (cur/len state frozen: identical work per block)."""
        cc = model.cfg
        cache = model.init_cache(1, length=arena)
        logits, cache = model._jit_prefill(
            params, jnp.asarray(ids_d), jnp.asarray(types_d), jnp.asarray([len(ids)]), cache
        )
        # host-side fused int4p pack (None for other quant modes) — the
        # production decode loops pass this the same way
        pack = model._decode_pack(params, cache)
        cur = jnp.asarray([len(ids)], jnp.int32)
        rec = jnp.full((1, cc.win_size), -1, jnp.int32)
        nd = jnp.zeros((1,), jnp.int32)
        ml = jnp.asarray([n_tokens], jnp.int32)
        fin = jnp.zeros((1,), bool)
        o = model._jit_decode_block(params, K(1), cache, cur, logits, rec, nd, ml, fin, block, stacked=pack)
        _sync(o[0])
        o = model._jit_decode_block(params, K(2), o[2], cur, logits, rec, nd, ml, fin, block, stacked=pack)
        _sync(o[0])  # >=2 warm runs: program upload is lazy
        t0 = time.time()
        for i in range(n_rep):
            o = model._jit_decode_block(
                params, K(3 + i), o[2], cur, logits, rec, nd, ml, fin, block, stacked=pack
            )
        _sync(o[0])
        return (time.time() - t0) / n_rep

    # ---- LM decode: bf16 and int8 weight-only (the TRT-LLM int8 role) ----
    t_compile0 = time.time()
    lm_dev_s = lm_block_time(lm, lm_params, n_tokens)
    compile_s = time.time() - t_compile0
    print(f"# lm_dev {lm_dev_s:.4f}", flush=True)

    import dataclasses

    q_lm = Qwen2LM(dataclasses.replace(lm.cfg, qwen=dataclasses.replace(lm.cfg.qwen, quant=True)))
    q_params = zeros_like_init(q_lm.init, K(0))  # values don't affect latency
    lm_dev_int8_s = lm_block_time(q_lm, q_params, n_tokens)
    print(f"# lm_dev_int8 {lm_dev_int8_s:.4f}", flush=True)

    # ---- token2wav: fused offline program (flow + mel slice + vocoder) ----
    tokens = rng.integers(0, 6561, n_tokens).astype(np.int32)
    L = 50 + n_tokens
    Lpad = ((L + 31) // 32) * 32
    tok_d = np.zeros((1, Lpad), np.int32)
    tok_d[0, :50] = prompt_speech_tokens
    tok_d[0, 50:L] = tokens
    tok_j = jnp.asarray(tok_d)
    tl_j = jnp.asarray([L])
    conds_j = jnp.asarray(np.concatenate([prompt_feat, np.zeros((1, Lpad * 2 - 100, 80), np.float32)], axis=1))
    emb_j = jnp.asarray(embedding)

    def t2w_once(key):
        return engine._jit_t2w_fused(
            engine.flow_params, engine.hift_params, tok_j, tl_j, conds_j, emb_j, key, prompt_mel_len=100
        )

    _sync(t2w_once(K(0)))
    _sync(t2w_once(K(1)))
    n_rep = 5
    t0 = time.time()
    for i in range(n_rep):
        w = t2w_once(K(2 + i))
    _sync(w)
    t2w_dev_s = (time.time() - t0) / n_rep
    print(f"# t2w_dev {t2w_dev_s:.4f}", flush=True)

    # ---- device-resident first-chunk latency: prefill + first 28-token block
    # + fused first streaming chunk (flow prefix + slice + HiFT + caches) ----
    tok_c = jnp.asarray(np.concatenate([tok_d[:, :75], np.zeros((1, 21), np.int32)], axis=1))
    ctx_c = jnp.asarray(tok_d[:, 75:78])
    conds_c = jnp.asarray(np.concatenate([prompt_feat, np.zeros((1, 92, 80), np.float32)], axis=1))
    zmel = jnp.zeros((1, engine.mel_cache_len, 80))
    zsrc = jnp.zeros((1, engine.source_cache_len))

    def first_chunk_once(seed, model=None, params=None):
        model = model or lm
        params = lm_params if params is None else params
        cache = model.init_cache(1, length=arena)
        l3, cache = model._jit_prefill(
            params, jnp.asarray(ids_d), jnp.asarray(types_d), jnp.asarray([len(ids)]), cache
        )
        o3 = model._jit_decode_block(
            params, K(seed), cache, jnp.asarray([len(ids)]), l3,
            jnp.full((1, model.cfg.win_size), -1, jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.asarray([n_tokens], jnp.int32), jnp.zeros((1,), bool), 28,
        )
        out_c = engine._jit_t2w_stream(
            engine.flow_params, engine.hift_params, tok_c, jnp.asarray([75]), conds_c,
            emb_j, ctx_c, K(seed + 1), zmel, zsrc, zsrc, jnp.asarray(0),
            prompt_mel_len=100, chunk_mel=50, first=True,
        )
        return o3[0], out_c[0]

    toks, wav_c = first_chunk_once(10)
    _sync([toks, wav_c])
    toks, wav_c = first_chunk_once(11)
    _sync([toks, wav_c])
    n_rep = 5
    t0 = time.time()
    outs = []
    for i in range(n_rep):
        outs.append(first_chunk_once(20 + 2 * i))
    _sync([o for pair in outs for o in pair])
    first_chunk_dev_ms = ((time.time() - t0) - rt_s) / n_rep * 1000.0
    print(f"# first_chunk_dev {first_chunk_dev_ms:.1f}ms (tunnel rt {rt_s*1000:.1f}ms subtracted)", flush=True)

    # same first-chunk path with the int8 LM (the production serving config)
    for seed in (12, 13):
        _sync(list(first_chunk_once(seed, q_lm, q_params)))
    t0 = time.time()
    outs = [first_chunk_once(40 + 2 * i, q_lm, q_params) for i in range(n_rep)]
    _sync([o for pair in outs for o in pair])
    first_chunk_int8_ms = ((time.time() - t0) - rt_s) / n_rep * 1000.0
    print(f"# first_chunk_dev_int8 {first_chunk_int8_ms:.1f}ms", flush=True)

    # ---- HEADLINE: everything the official metric needs is measured.
    # Emit the JSON line NOW, before any optional wall-clock/A-B section can
    # blow the driver's budget (round 1 lost its perf number to exactly
    # that: rc=124 with all device numbers already printed). ----
    rtf_dev = (lm_dev_s + t2w_dev_s) / audio_seconds
    rtf_int8 = (lm_dev_int8_s + t2w_dev_s) / audio_seconds
    baseline = 0.0891
    result = {
        "metric": "offline_rtf",
        # headline = the production serving config (int8 weight-only LM +
        # fused t2w), matching the baseline's TRT-LLM int8 role
        "value": round(rtf_int8, 4),
        "unit": "ratio",
        "vs_baseline": round(baseline / rtf_int8, 4),
        "rtf_bf16_lm": round(rtf_dev, 4),
        "vs_baseline_bf16": round(baseline / rtf_dev, 4),
        "lm_device_s": round(lm_dev_s, 4),
        "lm_device_s_int8": round(lm_dev_int8_s, 4),
        "t2w_device_s": round(t2w_dev_s, 4),
        "first_chunk_ms_device": round(first_chunk_dev_ms, 1),
        "first_chunk_ms_device_int8": round(first_chunk_int8_ms, 1),
        "tunnel_rt_ms": round(rt_s * 1000.0, 1),
        "audio_s": audio_seconds,
        "kv_arena": arena,
        "compile_s": round(compile_s, 1),
        "init_s": round(init_s, 1),
        "backend": jax.default_backend(),
        "note": "value = device-resident int8-LM timing, the production "
                "serving config (sync via value fetch; block_until_ready "
                "is a no-op through this rig's TPU tunnel); *_wall numbers "
                "include the ~30-90ms/roundtrip tunnel",
    }
    print(json.dumps(result), flush=True)

    # ---- quant extras: UNCONDITIONAL (r2 lost them to the deadline when
    # init_s ate the budget; with zeros_like_init they cost seconds and run
    # before any wall-clock section can blow the budget). Each failure is
    # isolated; the extended JSON line is re-printed after this block. ----
    budget_s = float(os.environ.get("COSY_BENCH_BUDGET_S", "420"))
    deadline = _T_START + budget_s

    def have(margin_s):
        return time.time() < deadline - margin_s

    # int4p: fused Pallas decode kernels (ops/int4_fused.py) — half the int8
    # weight bytes at near-int8 decode speed
    try:
        q4_lm = Qwen2LM(dataclasses.replace(lm.cfg, qwen=dataclasses.replace(lm.cfg.qwen, quant="int4p")))
        q4_params = zeros_like_init(q4_lm.init, K(0))
        lm_dev_int4p_s = lm_block_time(q4_lm, q4_params, n_tokens)
        print(f"# lm_dev_int4p {lm_dev_int4p_s:.4f}", flush=True)
        result["lm_device_s_int4p"] = round(lm_dev_int4p_s, 4)
        result["rtf_int4p_lm"] = round((lm_dev_int4p_s + t2w_dev_s) / audio_seconds, 4)
        # A/B the shift-free unpack scheme (trace-time env; a FRESH
        # Qwen2LM gets fresh jit wrappers so both schemes are measured
        # in one run)
        if have(60):
            os.environ["COSY_INT4_UNPACK"] = "fold"
            try:
                q4f_lm = Qwen2LM(q4_lm.cfg)
                lm_dev_int4p_fold_s = lm_block_time(q4f_lm, q4_params, n_tokens)
                result["lm_device_s_int4p_fold"] = round(lm_dev_int4p_fold_s, 4)
                print(f"# lm_dev_int4p_fold {lm_dev_int4p_fold_s:.4f}", flush=True)
            except Exception as e:  # noqa: BLE001 — experimental kernel path
                print(f"# int4p fold scheme failed: {type(e).__name__}: {e}", flush=True)
            finally:
                os.environ.pop("COSY_INT4_UNPACK", None)
        del q4_params
    except Exception as e:  # noqa: BLE001 — optional section
        print(f"# int4p section failed: {type(e).__name__}: {e}", flush=True)

    # int8 KV arena (kv_quant=True): halves the arena-read bytes that dominate
    # batched long-context decode; here measured at the bench shapes on the
    # int8-weight LM (the production combo). See ops/decode_attention.py
    # gqa_decode_attention_quant.
    try:
        kq_lm = Qwen2LM(dataclasses.replace(
            lm.cfg, qwen=dataclasses.replace(lm.cfg.qwen, quant=True, kv_quant=True)))
        lm_dev_kvq_s = lm_block_time(kq_lm, q_params, n_tokens)
        print(f"# lm_dev_kvq {lm_dev_kvq_s:.4f}", flush=True)
        result["lm_device_s_kvq"] = round(lm_dev_kvq_s, 4)
        result["rtf_kvq"] = round((lm_dev_kvq_s + t2w_dev_s) / audio_seconds, 4)
    except Exception as e:  # noqa: BLE001 — optional section
        print(f"# kv_quant section failed: {type(e).__name__}: {e}", flush=True)
    del q_params

    # quant extras are now locked in whatever happens below
    print(json.dumps(result), flush=True)

    # ---- wall-clock end-to-end through the public engine (includes the
    # tunnel: real users on-host would not pay these round trips) ----
    def e2e_once(seed):
        toks_all = []
        for block in lm.generate(lm_params, ids, types, K(seed), n_tokens, n_tokens, block_size=125):
            toks_all.extend(block.tolist())
        while len(toks_all) < n_tokens:
            toks_all.append(0)
        from cosyvoice_tpu.runtime.engine import SessionState

        return engine.token2wav(
            SessionState(), np.asarray(toks_all[:n_tokens], np.int32), prompt_speech_tokens,
            prompt_feat, embedding, token_offset=0, stream=False, finalize=True,
        )

    if have(120):
        try:
            e2e_once(30)
            e2e_once(31)
            t0 = time.time()
            e2e_once(32)
            wall_s = time.time() - t0
            result["rtf_wall_via_tunnel"] = round(wall_s / audio_seconds, 4)
            print(f"# rtf_wall {wall_s / audio_seconds:.4f}", flush=True)
        except Exception as e:  # noqa: BLE001 — optional section
            print(f"# e2e wall section failed: {type(e).__name__}: {e}", flush=True)

    # ---- streaming first-chunk latency through the public engine (wall) ----
    if have(120):
        try:
            def stream_gen(seed):
                return engine.tts(
                    text_tokens=text,
                    prompt_text_tokens=np.zeros(0, np.int32),
                    llm_prompt_speech_token=prompt_speech_tokens,
                    flow_prompt_speech_token=prompt_speech_tokens,
                    prompt_speech_feat=prompt_feat,
                    flow_embedding=embedding,
                    stream=True,
                    rng_seed=seed,
                )

            for seed in (7, 8):  # warm both streaming programs
                for _ in stream_gen(seed):
                    pass
            t0 = time.time()
            gen = stream_gen(9)
            next(gen)
            result["first_chunk_ms_wall"] = round((time.time() - t0) * 1000.0, 1)
            for _ in gen:
                pass
            print(f"# first_chunk_wall {result['first_chunk_ms_wall']}ms", flush=True)
        except Exception as e:  # noqa: BLE001 — optional section
            print(f"# streaming wall section failed: {type(e).__name__}: {e}", flush=True)

    # extended line: same metric/value/vs_baseline, extra keys only
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
