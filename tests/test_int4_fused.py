import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.ops.int4_fused import (
    MLP_INTER_ALIGN,
    int4_gemv,
    int4_matmul_blocked,
    int4_mlp,
    int4_mlp_reference,
    pack_down_int4,
    pack_gate_up_int4,
    quantize_tensor_int4_blocked,
    unpack_int4_blocked,
)
from cosyvoice_tpu.ops.quant import quantize_tensor_int4, unpack_int4


class TestBlockedPacking:
    def test_same_quant_grid_as_int4(self):
        """Blocked half-split must dequantize to EXACTLY the same weights as
        the ops.quant int4 layout (same per-(block, out) scales)."""
        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 128)).astype(np.float32)
        p_ref, s_ref = quantize_tensor_int4(w)
        wd_ref = np.asarray(unpack_int4(jnp.asarray(p_ref), jnp.float32))
        # apply the int4 layout's scales: blocks of 8 contiguous input rows
        g = 64 // 8
        wd_ref = wd_ref.reshape(8, g, 128) * s_ref[:, None, :]
        p_b, s_b = quantize_tensor_int4_blocked(w)
        wd_b = np.asarray(unpack_int4_blocked(jnp.asarray(p_b), jnp.asarray(s_b)))
        np.testing.assert_allclose(wd_b, wd_ref.reshape(64, 128), rtol=0, atol=0)

    def test_quantization_error_bounded(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((64, 128)).astype(np.float32)
        p, s = quantize_tensor_int4_blocked(w)
        wd = np.asarray(unpack_int4_blocked(jnp.asarray(p), jnp.asarray(s)))
        # absmax/7 grid: error <= scale/2 per element
        g = 64 // 8
        bound = (np.abs(w).reshape(8, g, 128).max(axis=1) / 7.0)[:, None, :] / 2 + 1e-6
        assert (np.abs(wd - w).reshape(8, g, 128) <= bound).all()


class TestGemv:
    @pytest.mark.parametrize("B,n_in,n_out", [(1, 64, 128), (4, 128, 256), (8, 64, 384)])
    def test_matches_xla_blocked(self, B, n_in, n_out):
        rng = np.random.default_rng(2)
        w = rng.standard_normal((n_in, n_out)).astype(np.float32) * 0.1
        x = rng.standard_normal((B, n_in)).astype(np.float32)
        p, s = quantize_tensor_int4_blocked(w)
        ref = int4_matmul_blocked(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s), jnp.float32)
        got = int4_gemv(
            jnp.asarray(x), jnp.asarray(p), jnp.asarray(s),
            out_dtype=jnp.float32, block_out=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)

    def test_fold_scheme_matches_planes(self):
        """The shift-free 'fold' unpack (dot identity on the raw byte) must
        agree with the per-plane unpack, including a ragged final block whose
        high half is pure padding (lo-only branch)."""
        from cosyvoice_tpu.ops.int4_fused import (
            _gemv_planes,
            _gemv_planes_fold,
            _lane_pad,
            pack_gemv_int4,
        )

        rng = np.random.default_rng(11)
        for n_in in (384, 512):  # 1.5 blocks (ragged) and 2 full blocks
            w = rng.standard_normal((n_in, 128)).astype(np.float32) * 0.1
            x = rng.standard_normal((2, n_in)).astype(np.float32)
            p, s = pack_gemv_int4(w)
            nb, half, _ = p.shape
            xb = _lane_pad(jnp.asarray(x, jnp.bfloat16), half, nb * 2 * half)
            n_pad = xb.shape[-1]
            a = _gemv_planes(xb, jnp.asarray(p), jnp.asarray(s), nb, half, n_pad)
            b = _gemv_planes_fold(xb, jnp.asarray(p), jnp.asarray(s), nb, half, n_pad)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-2, atol=2e-2)

    def test_matches_float_matmul_within_quant_error(self):
        rng = np.random.default_rng(3)
        w = rng.standard_normal((64, 128)).astype(np.float32) * 0.05
        x = rng.standard_normal((2, 64)).astype(np.float32)
        p, s = quantize_tensor_int4_blocked(w)
        wd = np.asarray(unpack_int4_blocked(jnp.asarray(p), jnp.asarray(s)))
        exact = x @ wd
        got = int4_gemv(jnp.asarray(x), jnp.asarray(p), jnp.asarray(s),
                        out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), exact, rtol=3e-2, atol=3e-2)


class TestFusedMLP:
    @pytest.mark.parametrize("inter", [384, 512, 1024])  # 384 exercises padding
    def test_matches_reference(self, inter):
        rng = np.random.default_rng(4)
        n_in, n_out, B = 64, 128, 2
        w_gu = rng.standard_normal((n_in, 2 * inter)).astype(np.float32) * 0.1
        w_d = rng.standard_normal((inter, n_out)).astype(np.float32) * 0.1
        x = rng.standard_normal((B, n_in)).astype(np.float32)
        gup, gus = pack_gate_up_int4(w_gu)
        dp, ds = pack_down_int4(w_d)
        ref = int4_mlp_reference(
            jnp.asarray(x), jnp.asarray(gup), jnp.asarray(gus),
            jnp.asarray(dp), jnp.asarray(ds), jnp.float32,
        )
        got = int4_mlp(
            jnp.asarray(x), jnp.asarray(gup), jnp.asarray(gus),
            jnp.asarray(dp), jnp.asarray(ds),
            out_dtype=jnp.float32, block_inter=512, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)

    def test_o_mlp_fused_tail_matches_reference(self):
        """o_proj + residual + rmsnorm + MLP + residual in one kernel must
        match the XLA reference path."""
        from cosyvoice_tpu.ops.int4_fused import (
            int4_o_mlp,
            int4_o_mlp_reference,
            pack_gemv_int4,
        )

        rng = np.random.default_rng(6)
        n_hid, n_attn, inter, B = 128, 128, 384, 2
        w_o = rng.standard_normal((n_attn, n_hid)).astype(np.float32) * 0.1
        w_gu = rng.standard_normal((n_hid, 2 * inter)).astype(np.float32) * 0.1
        w_d = rng.standard_normal((inter, n_hid)).astype(np.float32) * 0.1
        nw = rng.standard_normal(n_hid).astype(np.float32)
        attn = rng.standard_normal((B, n_attn)).astype(np.float32)
        x_res = rng.standard_normal((B, n_hid)).astype(np.float32)
        op, osc = pack_gemv_int4(w_o)
        gup, gus = pack_gate_up_int4(w_gu)
        dp, ds = pack_down_int4(w_d)
        args = [jnp.asarray(a) for a in (attn, x_res, nw, op, osc, gup, gus, dp, ds)]
        ref = int4_o_mlp_reference(*args, eps=1e-6, dtype=jnp.float32)
        got = int4_o_mlp(*args, eps=1e-6, out_dtype=jnp.float32, block_inter=512, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=3e-2, atol=3e-2)

    def test_padding_columns_are_inert(self):
        """The zero-padded intermediate columns must contribute nothing."""
        rng = np.random.default_rng(5)
        n_in, inter, n_out = 64, 384, 128  # pads to 512
        w_gu = rng.standard_normal((n_in, 2 * inter)).astype(np.float32) * 0.1
        w_d = rng.standard_normal((inter, n_out)).astype(np.float32) * 0.1
        x = rng.standard_normal((1, n_in)).astype(np.float32)
        gup, gus = pack_gate_up_int4(w_gu)
        dp, ds = pack_down_int4(w_d)
        assert gup.shape[-1] == 512 and dp.shape[0] == 1
        got = int4_mlp_reference(
            jnp.asarray(x), jnp.asarray(gup), jnp.asarray(gus),
            jnp.asarray(dp), jnp.asarray(ds), jnp.float32,
        )
        # float reference on the UNPADDED dequantized weights (both input
        # rows and intermediate columns are zero-padded by the packers)
        wg = np.asarray(unpack_int4_blocked(jnp.asarray(gup[0]), jnp.asarray(gus[0])))[:n_in, :inter]
        wu = np.asarray(unpack_int4_blocked(jnp.asarray(gup[1]), jnp.asarray(gus[1])))[:n_in, :inter]
        wd = np.asarray(unpack_int4_blocked(jnp.asarray(dp), jnp.asarray(ds)))[:inter]
        act = jax.nn.silu(x @ wg) * (x @ wu)
        exact = np.asarray(act @ wd)
        np.testing.assert_allclose(np.asarray(got), exact, rtol=3e-2, atol=3e-2)
