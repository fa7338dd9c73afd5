"""Whole-decode-step fused kernel (ops/int4_block.py): kernel-vs-reference
and fused-vs-unfused model decode parity."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.ops.int4_block import (
    int4_decode_layers,
    int4_decode_layers_reference,
    stack_decode_params,
)
from cosyvoice_tpu.ops.int4_fused import (
    pack_down_int4,
    pack_gate_up_int4,
    pack_gemv_int4,
)

L, HID, NH, NKV, D = 3, 128, 2, 2, 64
NQ = NH * D
LANES = NKV * D
NQKV = NQ + 2 * LANES
INTER = 256
A = 128


def _pack(rng):
    packs = dict(nw1=[], nw2=[], qkv_p=[], qkv_s=[], qkv_b=[], o_p=[], o_s=[],
                 gu_p=[], gu_s=[], d_p=[], d_s=[])
    for _ in range(L):
        qp, qs = pack_gemv_int4(rng.standard_normal((HID, NQKV)).astype(np.float32) * 0.05)
        op, osc = pack_gemv_int4(rng.standard_normal((NQ, HID)).astype(np.float32) * 0.05)
        gp, gs = pack_gate_up_int4(rng.standard_normal((HID, 2 * INTER)).astype(np.float32) * 0.05)
        dp, ds = pack_down_int4(rng.standard_normal((INTER, HID)).astype(np.float32) * 0.05)
        packs["nw1"].append(1.0 + 0.1 * rng.standard_normal(HID).astype(np.float32))
        packs["nw2"].append(1.0 + 0.1 * rng.standard_normal(HID).astype(np.float32))
        packs["qkv_p"].append(qp); packs["qkv_s"].append(qs)
        packs["qkv_b"].append(rng.standard_normal(NQKV).astype(np.float32) * 0.05)
        packs["o_p"].append(op); packs["o_s"].append(osc)
        packs["gu_p"].append(gp); packs["gu_s"].append(gs)
        packs["d_p"].append(dp); packs["d_s"].append(ds)
    return {k: jnp.asarray(np.stack(v)) for k, v in packs.items()}


class TestKernelVsReference:
    @pytest.mark.parametrize("pos", [1, 5, A - 1])
    def test_matches_reference(self, pos):
        rng = np.random.default_rng(0)
        w = _pack(rng)
        x = jnp.asarray(rng.standard_normal((1, HID)).astype(np.float32) * 0.5)
        cos = jnp.asarray(np.cos(rng.standard_normal((1, D // 2))).astype(np.float32))
        sin = jnp.asarray(np.sin(rng.standard_normal((1, D // 2))).astype(np.float32))
        ka = jnp.asarray(rng.standard_normal((L, A, LANES)).astype(np.float32) * 0.5)
        va = jnp.asarray(rng.standard_normal((L, A, LANES)).astype(np.float32) * 0.5)
        ref = int4_decode_layers_reference(
            x, cos, sin, pos, ka, va, **w, eps=1e-6, out_dtype=jnp.float32)
        got = int4_decode_layers(
            x, cos, sin, pos, ka, va, **w, eps=1e-6, out_dtype=jnp.float32, interpret=True)
        for g, r, what in zip(got, ref, ("x", "k_new", "v_new")):
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(r, np.float32),
                rtol=5e-2, atol=5e-2, err_msg=what)

    def test_stale_self_row_not_read(self):
        """The arena row AT pos must not influence the output (the fresh
        in-register k/v is the self term)."""
        rng = np.random.default_rng(1)
        w = _pack(rng)
        x = jnp.asarray(rng.standard_normal((1, HID)).astype(np.float32) * 0.5)
        cos = jnp.asarray(np.cos(rng.standard_normal((1, D // 2))).astype(np.float32))
        sin = jnp.asarray(np.sin(rng.standard_normal((1, D // 2))).astype(np.float32))
        ka = rng.standard_normal((L, A, LANES)).astype(np.float32)
        va = rng.standard_normal((L, A, LANES)).astype(np.float32)
        pos = 7
        out1 = int4_decode_layers(
            x, cos, sin, pos, jnp.asarray(ka), jnp.asarray(va), **w, interpret=True)
        ka2, va2 = ka.copy(), va.copy()
        ka2[:, pos] = 99.0
        va2[:, pos] = -99.0
        out2 = int4_decode_layers(
            x, cos, sin, pos, jnp.asarray(ka2), jnp.asarray(va2), **w, interpret=True)
        for a, b in zip(out1, out2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestModelParity:
    def _tiny_lm(self):
        import dataclasses

        from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
        from cosyvoice_tpu.models.qwen2 import Qwen2Config
        from cosyvoice_tpu.ops.quant import quantize_lm_params

        qwen = Qwen2Config(
            hidden_size=HID, num_layers=L, num_heads=NH, num_kv_heads=NKV,
            head_dim=D, intermediate_size=INTER, vocab_size=64,
            max_cache_len=A, dtype=jnp.float32,
        )
        cfg = LMConfig(speech_token_size=50, block_size=4, qwen=qwen)
        fp = Qwen2LM(cfg)
        params = fp.init(jax.random.PRNGKey(0))
        qparams = quantize_lm_params(params, mode="int4p")
        qlm = Qwen2LM(dataclasses.replace(cfg, qwen=dataclasses.replace(qwen, quant="int4p")))
        return qlm, qparams

    @pytest.mark.slow
    def test_fused_step_matches_unfused(self):
        qlm, qparams = self._tiny_lm()
        cache = qlm.init_cache(1, length=A)
        rng = np.random.default_rng(2)
        # fill a short prefix so attention has context
        ids = jnp.asarray(rng.integers(0, 50, (1, 8)), jnp.int32)
        types = jnp.ones((1, 8), jnp.int32)
        logits0, cache = qlm._jit_prefill(qparams, ids, types, jnp.asarray([8]), cache)
        tok = jnp.asarray([7], jnp.int32)
        cur = jnp.asarray([8], jnp.int32)
        ref_logits, ref_cache = qlm.module.apply(
            qparams, tok, cur, cache, method="decode_step")
        lt = [qparams["params"]["llm"][f"layers_{i}"] for i in range(L)]
        stacked = stack_decode_params(lt)
        got_logits, got_cache = qlm.module.apply(
            qparams, tok, cur, cache, stacked, method="decode_step_fused")
        np.testing.assert_allclose(
            np.asarray(got_logits), np.asarray(ref_logits), rtol=6e-2, atol=6e-2)
        # committed KV rows match; all other rows untouched
        for got, ref in zip(got_cache, ref_cache):
            np.testing.assert_allclose(
                np.asarray(got[:, 0, 8]), np.asarray(ref[:, 0, 8]), rtol=6e-2, atol=6e-2)
            mask = np.ones(A, bool); mask[8] = False
            np.testing.assert_array_equal(
                np.asarray(got[:, 0, mask]), np.asarray(ref[:, 0, mask]))

    def test_block_routing_force(self):
        """COSY_INT4_BLOCK=force routes the decode block through the fused
        step on CPU (interpret); the block must run and emit legal tokens.
        The pack is built host-side once per params (_decode_pack) and must
        be identity-cached across blocks."""
        qlm, qparams = self._tiny_lm()
        cache = qlm.init_cache(1, length=A)
        rng = np.random.default_rng(3)
        ids = jnp.asarray(rng.integers(0, 50, (1, 8)), jnp.int32)
        types = jnp.ones((1, 8), jnp.int32)
        logits0, cache = qlm._jit_prefill(qparams, ids, types, jnp.asarray([8]), cache)
        os.environ["COSY_INT4_BLOCK"] = "force"
        try:
            stacked = qlm._decode_pack(qparams, cache)
            assert stacked is not None, "force mode must build the fused pack"
            # identity-cached: a second call for the same params is the SAME
            # arrays (no per-block device restage)
            assert qlm._decode_pack(qparams, cache) is stacked
            tokens, logits, cache, cur, rec, ndec, fin = qlm._jit_decode_block(
                qparams, jax.random.PRNGKey(0), cache, jnp.asarray([8], jnp.int32),
                logits0, jnp.full((1, qlm.cfg.win_size), -1, jnp.int32),
                jnp.zeros((1,), jnp.int32), jnp.asarray([4], jnp.int32),
                jnp.zeros((1,), bool), 4, stacked=stacked,
            )
        finally:
            os.environ.pop("COSY_INT4_BLOCK")
        t = np.asarray(tokens)
        assert t.shape == (1, 4)
        assert (t >= 0).all() and (t < qlm.cfg.head_size).all()
        assert int(np.asarray(cur)[0]) <= 12

    def test_decode_pack_gates(self):
        """_decode_pack refuses batch>1 arenas, COSY_INT4_BLOCK=0, and head
        configs whose qkv/lane dims are not 128-lane multiples."""
        import dataclasses

        qlm, qparams = self._tiny_lm()
        cache1 = qlm.init_cache(1, length=A)
        os.environ["COSY_INT4_BLOCK"] = "0"
        try:
            assert qlm._decode_pack(qparams, cache1) is None
        finally:
            os.environ["COSY_INT4_BLOCK"] = "force"
        try:
            assert qlm._decode_pack(qparams, qlm.init_cache(2, length=A)) is None
            # qkv_out = (3+2*1)*48 = 240, lanes = 48: not 128-multiples
            from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
            from cosyvoice_tpu.models.qwen2 import Qwen2Config

            odd = Qwen2LM(LMConfig(speech_token_size=50, qwen=Qwen2Config(
                hidden_size=128, num_layers=1, num_heads=3, num_kv_heads=1,
                head_dim=48, intermediate_size=256, vocab_size=64,
                max_cache_len=A, dtype=jnp.float32, quant="int4p")))
            assert odd._decode_pack(qparams, odd.init_cache(1, length=A)) is None
        finally:
            os.environ.pop("COSY_INT4_BLOCK")
