"""On-TPU microbenchmarks for the int4p decode kernels.

Run on real hardware (not CPU-meaningful):
  python -m cosyvoice_tpu.tools.microbench_int4 [--profile]

Default: whole-step fused kernel correctness at production shapes + chained
timing (us/layer vs the HBM floor). --profile: per-piece decomposition
(qkv gemv / o+mlp tail / XLA attention glue / full layer). A/B the unpack
schemes with COSY_INT4_UNPACK=planes|fold.
"""
import sys


def run_blockbench():
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cosyvoice_tpu.ops.int4_block import (
        int4_decode_layers, int4_decode_layers_reference,
    )
    from cosyvoice_tpu.ops.int4_fused import (
        pack_down_int4, pack_gate_up_int4, pack_gemv_int4,
    )

    K = jax.random.PRNGKey
    rng = np.random.default_rng(0)
    L, HID, NH, NKV, D = 24, 896, 14, 2, 64
    NQ, LANES = NH * D, NKV * D
    NQKV = NQ + 2 * LANES
    INTER = 4864
    A = 512
    REPS = 50


    def sync(x):
        return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


    packs = dict(nw1=[], nw2=[], qkv_p=[], qkv_s=[], qkv_b=[], o_p=[], o_s=[],
                 gu_p=[], gu_s=[], d_p=[], d_s=[])
    for _ in range(L):
        qp, qs = pack_gemv_int4(rng.standard_normal((HID, NQKV)).astype(np.float32) * 0.02)
        op, osc = pack_gemv_int4(rng.standard_normal((NQ, HID)).astype(np.float32) * 0.02)
        gp, gs = pack_gate_up_int4(rng.standard_normal((HID, 2 * INTER)).astype(np.float32) * 0.02)
        dp, ds = pack_down_int4(rng.standard_normal((INTER, HID)).astype(np.float32) * 0.02)
        packs["nw1"].append(1 + 0.1 * rng.standard_normal(HID).astype(np.float32))
        packs["nw2"].append(1 + 0.1 * rng.standard_normal(HID).astype(np.float32))
        packs["qkv_p"].append(qp); packs["qkv_s"].append(qs)
        packs["qkv_b"].append(rng.standard_normal(NQKV).astype(np.float32) * 0.02)
        packs["o_p"].append(op); packs["o_s"].append(osc)
        packs["gu_p"].append(gp); packs["gu_s"].append(gs)
        packs["d_p"].append(dp); packs["d_s"].append(ds)
    w = {k: jnp.asarray(np.stack(v)) for k, v in packs.items()}

    x = jnp.asarray(rng.standard_normal((1, HID)).astype(np.float32) * 0.3)
    cos = jnp.asarray(np.cos(rng.standard_normal((1, D // 2))).astype(np.float32))
    sin = jnp.asarray(np.sin(rng.standard_normal((1, D // 2))).astype(np.float32))
    ka = jnp.asarray((rng.standard_normal((L, A, LANES)) * 0.3).astype(np.float32)).astype(jnp.bfloat16)
    va = jnp.asarray((rng.standard_normal((L, A, LANES)) * 0.3).astype(np.float32)).astype(jnp.bfloat16)
    pos = 300

    print("=== correctness at production shapes ===")
    ref = int4_decode_layers_reference(x, cos, sin, pos, ka, va, **w, out_dtype=jnp.float32)
    got = int4_decode_layers(x, cos, sin, pos, ka, va, **w, out_dtype=jnp.float32)
    for g, r, what in zip(got, ref, ("x", "k_new", "v_new")):
        g, r = np.asarray(g, np.float32), np.asarray(r, np.float32)
        err = np.abs(g - r).max()
        rel = err / (np.abs(r).max() + 1e-9)
        print(f"{what}: max_abs_err={err:.5f} rel={rel:.5f}")

    print("=== timing: chained steps in one program ===")


    @jax.jit
    def chain(x, ka, va):
        def body(carry, i):
            h, ka, va = carry
            xo, kn, vn = int4_decode_layers(h, cos, sin, pos, ka, va, **w)
            ka = jax.lax.dynamic_update_slice(ka, kn[:, None, :].astype(ka.dtype), (0, pos, 0))
            va = jax.lax.dynamic_update_slice(va, vn[:, None, :].astype(va.dtype), (0, pos, 0))
            return (xo.astype(jnp.float32), ka, va), None
        (h, ka, va), _ = jax.lax.scan(body, (x, ka, va), None, length=REPS)
        return h


    o = chain(x, ka, va); sync(o)
    o = chain(x, ka, va); sync(o)
    t0 = time.time()
    for _ in range(3):
        o = chain(x, ka, va)
    sync(o)
    dt = (time.time() - t0) / 3 / REPS * 1000
    print(f"fused whole-step: {dt:.3f} ms/step  ({dt / L * 1000:.1f} us/layer)")


def run_layerprof():
    import functools
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cosyvoice_tpu.ops.int4_fused import (
        int4_gemv, int4_o_mlp, pack_down_int4, pack_gate_up_int4, pack_gemv_int4,
    )

    K = jax.random.PRNGKey
    rng = np.random.default_rng(0)
    N_LAYERS = 24
    REPS = 50
    HID, NQ, NKV, NH, HKV, D = 896, 896, 128, 14, 2, 64
    INTER = 4864
    ARENA = 512


    def sync(x):
        return float(jnp.sum(jnp.abs(x.astype(jnp.float32))))


    def timeit(name, fn, *args, reps=3):
        o = fn(*args); sync(o)
        o = fn(*args); sync(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn(*args)
        sync(o)
        dt = (time.time() - t0) / reps / REPS * 1000
        print(f"{name}: {dt:.3f} ms  ({dt / N_LAYERS * 1000:.1f} us/layer)")
        return dt


    # ---- weights (one layer's worth, reused across the 24 chained steps) ----
    qkv_p, qkv_s = pack_gemv_int4(rng.standard_normal((HID, NQ + 2 * NKV)).astype(np.float32) * 0.02)
    o_p, o_s = pack_gemv_int4(rng.standard_normal((NQ, HID)).astype(np.float32) * 0.02)
    gu_p, gu_s = pack_gate_up_int4(rng.standard_normal((HID, 2 * INTER)).astype(np.float32) * 0.02)
    d_p, d_s = pack_down_int4(rng.standard_normal((INTER, HID)).astype(np.float32) * 0.02)
    nw = jnp.asarray(rng.standard_normal(HID).astype(np.float32) * 0.1)
    qkv_p, qkv_s, o_p, o_s, gu_p, gu_s, d_p, d_s = map(jnp.asarray, (qkv_p, qkv_s, o_p, o_s, gu_p, gu_s, d_p, d_s))

    x0 = jnp.asarray(rng.standard_normal((1, HID)).astype(np.float32)).astype(jnp.bfloat16)
    k_arena = jnp.asarray(rng.standard_normal((1, ARENA, HKV, D)).astype(np.float32)).astype(jnp.bfloat16)
    v_arena = jnp.asarray(rng.standard_normal((1, ARENA, HKV, D)).astype(np.float32)).astype(jnp.bfloat16)
    cos = jnp.asarray(rng.standard_normal((1, D // 2)).astype(np.float32))
    sin = jnp.asarray(rng.standard_normal((1, D // 2)).astype(np.float32))
    pos = jnp.asarray(300, jnp.int32)


    def rope(v, cos, sin):
        h = v.shape[-1] // 2
        a, b = v[..., :h], v[..., h:]
        return jnp.concatenate([a * cos - b * sin, b * cos + a * sin], -1).astype(v.dtype)


    def attn_xla(qkv, k_arena, v_arena):
        q = qkv[:, :NQ].reshape(1, 1, NH, D)
        k = qkv[:, NQ:NQ + NKV].reshape(1, 1, HKV, D)
        v = qkv[:, NQ + NKV:].reshape(1, 1, HKV, D)
        q = rope(q, cos, sin)
        k = rope(k, cos, sin)
        ka = jax.lax.dynamic_update_slice(k_arena, k.astype(k_arena.dtype), (0, pos, 0, 0))
        va = jax.lax.dynamic_update_slice(v_arena, v.astype(v_arena.dtype), (0, pos, 0, 0))
        qg = q.reshape(1, 1, HKV, NH // HKV, D)
        sc = jnp.einsum("bsgrd,btgd->bgrst", qg, ka).astype(jnp.float32) / np.sqrt(D)
        mask = (jnp.arange(ARENA) <= pos)[None, None, None, None, :]
        sc = jnp.where(mask, sc, -1e9)
        at = jax.nn.softmax(sc, -1).astype(va.dtype)
        return jnp.einsum("bgrst,btgd->bsgrd", at, va).reshape(1, NQ), ka, va


    @jax.jit
    def chain_qkv(x):
        def body(h, _):
            y = int4_gemv(h, qkv_p, qkv_s)  # [1, 1152]
            return y[:, :HID], None
        h, _ = jax.lax.scan(body, x, None, length=N_LAYERS * REPS)
        return h


    @jax.jit
    def chain_tail(x):
        def body(h, _):
            y = int4_o_mlp(h, h, nw, o_p, o_s, gu_p, gu_s, d_p, d_s)
            return y, None
        h, _ = jax.lax.scan(body, x, None, length=N_LAYERS * REPS)
        return h


    @jax.jit
    def chain_attn(x, ka, va):
        def body(carry, _):
            h, ka, va = carry
            qkv = jnp.pad(h, ((0, 0), (0, NQ + 2 * NKV - HID)))
            out, ka, va = attn_xla(qkv, ka, va)
            return (out[:, :HID], ka, va), None
        (h, ka, va), _ = jax.lax.scan(body, (x, ka, va), None, length=N_LAYERS * REPS)
        return h


    @jax.jit
    def chain_layer(x, ka, va):
        def body(carry, _):
            h, ka, va = carry
            # norm (XLA)
            h32 = h.astype(jnp.float32)
            hn = (h32 * jax.lax.rsqrt(jnp.mean(h32 * h32, -1, keepdims=True) + 1e-6) * nw).astype(jnp.bfloat16)
            qkv = int4_gemv(hn, qkv_p, qkv_s)
            out, ka, va = attn_xla(qkv, ka, va)
            y = int4_o_mlp(out.astype(jnp.bfloat16), h, nw, o_p, o_s, gu_p, gu_s, d_p, d_s)
            return (y, ka, va), None
        (h, ka, va), _ = jax.lax.scan(body, (x, ka, va), None, length=N_LAYERS * REPS)
        return h


    print("backend:", jax.default_backend())
    t_qkv = timeit("24x qkv gemv       ", chain_qkv, x0)
    t_tail = timeit("24x o+mlp tail     ", chain_tail, x0)
    t_attn = timeit("24x xla attn+write ", chain_attn, x0, k_arena, v_arena)
    t_full = timeit("24x full layer     ", chain_layer, x0, k_arena, v_arena)
    print(f"sum of parts: {t_qkv + t_tail + t_attn:.3f} ms vs full {t_full:.3f} ms")
    # int4 weight bytes per layer
    bytes_layer = (qkv_p.size + o_p.size + gu_p.size + d_p.size)
    print(f"int4 packed bytes/layer: {bytes_layer/1e6:.2f} MB; 24-layer floor @819GB/s: "
          f"{bytes_layer * 24 / 819e9 * 1000:.3f} ms")


if __name__ == "__main__":
    if "--profile" in sys.argv:
        run_layerprof()
    else:
        run_blockbench()
