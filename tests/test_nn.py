import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.nn import (
    Conv1d,
    WNConv1d,
    WNConvTranspose1d,
    CausalConv1d,
    CausalConv1dUpsample,
    ConvolutionModule,
    EspnetRelPositionalEncoding,
    RelPositionMultiHeadAttention,
    ConformerEncoderLayer,
    UpsampleConformerEncoder,
    PreLookaheadLayer,
    ResnetBlock1D,
    BasicTransformerBlock,
)

K = jax.random.PRNGKey


class TestConvs:
    def test_conv1d_matches_torch(self):
        import torch

        x = np.random.default_rng(0).standard_normal((2, 20, 4)).astype(np.float32)
        m = Conv1d(6, 3, padding=1)
        params = m.init(K(0), jnp.asarray(x))
        y = m.apply(params, jnp.asarray(x))
        w = np.asarray(params["params"]["kernel"])  # [k, in, out]
        tc = torch.nn.Conv1d(4, 6, 3, padding=1)
        tc.weight.data = torch.from_numpy(w.transpose(2, 1, 0))  # [out, in, k]
        tc.bias.data.zero_()
        ty = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)

    def test_convtranspose_matches_torch(self):
        import torch

        x = np.random.default_rng(1).standard_normal((1, 10, 3)).astype(np.float32)
        m = WNConvTranspose1d(5, 4, 2, padding=1)
        params = m.init(K(0), jnp.asarray(x))
        y = m.apply(params, jnp.asarray(x))
        assert y.shape == (1, 20, 5)  # (10-1)*2 - 2 + 4 = 20
        v = np.asarray(params["params"]["v"])  # [k, in, out]
        g = np.asarray(params["params"]["g"])
        tc = torch.nn.ConvTranspose1d(3, 5, 4, 2, padding=1)
        wv = torch.from_numpy(v.transpose(1, 2, 0))  # [in, out, k]
        norm = wv.norm(dim=(1, 2), keepdim=True)
        tc.weight.data = wv * (torch.from_numpy(g).reshape(3, 1, 1) / norm)
        tc.bias.data.zero_()
        ty = tc(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)

    def test_causal_conv_is_causal(self):
        m = CausalConv1d(4, 3, dilation=2)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 4)).astype(np.float32))
        params = m.init(K(0), x)
        y1 = m.apply(params, x)
        x2 = x.at[0, 10:].set(99.0)
        y2 = m.apply(params, x2)
        np.testing.assert_allclose(np.asarray(y1[0, :10]), np.asarray(y2[0, :10]), atol=1e-6)
        assert y1.shape == x.shape

    def test_causal_conv_right_lookahead(self):
        m = CausalConv1d(4, 5, causal_type="right")
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 4)).astype(np.float32))
        params = m.init(K(0), x)
        y1 = m.apply(params, x)
        # right-causal with k=5 -> output t depends on x[t : t+5]
        x2 = x.at[0, :8].set(99.0)
        y2 = m.apply(params, x2)
        np.testing.assert_allclose(np.asarray(y1[0, 8:11]), np.asarray(y2[0, 8:11]), atol=1e-5)

    def test_causal_conv_cache_equivalence(self):
        """Chunked eval with carried cache == full eval (streaming identity)."""
        m = CausalConv1d(4, 3)
        x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 20, 4)).astype(np.float32))
        params = m.init(K(0), x)
        full = m.apply(params, x)
        pad = 2
        c = jnp.zeros((1, pad, 4))
        outs = []
        for s in range(0, 20, 5):
            chunk = x[:, s : s + 5]
            outs.append(m.apply(params, chunk, c))
            c = jnp.concatenate([c, chunk], axis=1)[:, -pad:]
        np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)), np.asarray(full), atol=1e-5)

    def test_causal_upsample_shape(self):
        m = CausalConv1dUpsample(8, 16, 8)
        x = jnp.ones((1, 10, 4))
        params = m.init(K(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 80, 8)

    def test_conv_module_masking(self):
        m = ConvolutionModule(8)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 12, 8)).astype(np.float32))
        mask = jnp.asarray([[True] * 12, [True] * 6 + [False] * 6])
        params = m.init(K(0), x, mask)
        y, _ = m.apply(params, x, mask)
        assert np.abs(np.asarray(y[1, 6:])).max() == 0.0


class TestRelPosAttention:
    def test_rel_shift_matches_pad_trick(self):
        import torch

        B, H, T = 1, 2, 7
        x = np.random.default_rng(0).standard_normal((B, H, T, 2 * T - 1)).astype(np.float32)
        ours = RelPositionMultiHeadAttention.rel_shift(jnp.asarray(x), T)
        # torch pad-trick reference (attention.py:225-247)
        xt = torch.from_numpy(x)
        zero_pad = torch.zeros((B, H, T, 1))
        x_padded = torch.cat([zero_pad, xt], dim=-1).view(B, H, 2 * T, T)
        expect = x_padded[:, :, 1:].view_as(xt)[:, :, :, : T]
        np.testing.assert_allclose(np.asarray(ours), expect.numpy(), atol=1e-6)

    def test_attention_runs_and_masks(self):
        m = RelPositionMultiHeadAttention(4, 32)
        pe = EspnetRelPositionalEncoding(32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 32)).astype(np.float32))
        xs, pos = pe(x)
        mask = jnp.ones((2, 10, 10), bool)
        params = m.init(K(0), xs, xs, xs, mask, pos)
        y, (k, v) = m.apply(params, xs, xs, xs, mask, pos)
        assert y.shape == (2, 10, 32) and k.shape == (2, 4, 10, 8)


class TestConformer:
    def test_layer_shapes(self):
        m = ConformerEncoderLayer(size=32, attention_heads=4, linear_units=64)
        pe = EspnetRelPositionalEncoding(32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 32)).astype(np.float32))
        xs, pos = pe(x)
        mask = jnp.ones((2, 10, 10), bool)
        params = m.init(K(0), xs, mask, pos)
        y = m.apply(params, xs, mask, pos)
        assert y.shape == (2, 10, 32)

    def test_prelookahead_window(self):
        m = PreLookaheadLayer(16, 3)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 20, 16)).astype(np.float32))
        params = m.init(K(0), x)
        y1 = m.apply(params, x)
        # changing x[t0+4:] must not affect output at t0 (3-frame lookahead + conv1 reach)
        x2 = x.at[0, 10:].set(5.0)
        y2 = m.apply(params, x2)
        np.testing.assert_allclose(np.asarray(y1[0, :7]), np.asarray(y2[0, :7]), atol=1e-5)
        assert np.abs(np.asarray(y1[0, 8:10] - y2[0, 8:10])).max() > 0  # lookahead really looks ahead

    def test_upsample_encoder_chunk_prefix_stability(self):
        """Streaming chunk-mask property: appending tokens must not change
        earlier chunks' outputs (given the 3-token lookahead context)."""
        enc = UpsampleConformerEncoder(
            output_size=32, attention_heads=4, linear_units=64, num_blocks=2, num_up_blocks=1, static_chunk_size=5
        )
        rng = np.random.default_rng(0)
        tok = jnp.asarray(rng.standard_normal((1, 13, 32)).astype(np.float32))

        def body(n, pad):
            """zero-tail-padded body of n frames (context scatters at n)."""
            b = np.zeros((1, n + pad, 32), np.float32)
            b[:, :n] = np.asarray(tok[:, :n])
            return jnp.asarray(b)

        params = enc.init(K(0), body(5, 4), jnp.asarray([5]), tok[:, 5:8], True)
        # chunk 1 with lookahead context (tokens 5..7)
        y1, _ = enc.apply(params, body(5, 4), jnp.asarray([5]), tok[:, 5:8], True)
        # two chunks with context (tokens 10..12)
        y2, _ = enc.apply(params, body(10, 4), jnp.asarray([10]), tok[:, 10:13], True)
        np.testing.assert_allclose(np.asarray(y1[:, :10]), np.asarray(y2[:, :10]), atol=2e-5)


class TestUNetBlocks:
    def test_resnet_block(self):
        m = ResnetBlock1D(dim_out=16, causal=True)
        x = jnp.ones((2, 12, 8))
        mask = jnp.ones((2, 12))
        t = jnp.ones((2, 32))
        params = m.init(K(0), x, mask, t)
        y = m.apply(params, x, mask, t)
        assert y.shape == (2, 12, 16)

    def test_transformer_block(self):
        m = BasicTransformerBlock(num_heads=4, head_dim=8)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 16)).astype(np.float32))
        bias = jnp.zeros((2, 10, 10))
        params = m.init(K(0), x, bias)
        y = m.apply(params, x, bias)
        assert y.shape == x.shape
