import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.models.dit import DiTConfig, DiTEstimator
from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig

K = jax.random.PRNGKey
CHUNK = 5


@pytest.fixture(scope="module")
def dit_flow():
    cfg = FlowConfig(
        input_size=80,
        vocab_size=50,
        chunk_size=CHUNK,
        encoder_type="dit_prelookahead",
        estimator_type="dit",
        dit_lookahead_channels=32,
        dit=DiTConfig(dim=32, depth=2, heads=2, dim_head=8, static_chunk_size=CHUNK * 2, freq_embed_dim=16),
        cfm=CFMConfig(n_timesteps=2),
    )
    model = CausalFlow(cfg)
    params = model.init(K(0))
    return model, params


class TestDiTFlow:
    def test_inference_shape(self, dit_flow):
        model, params = dit_flow
        token = jnp.asarray(np.random.default_rng(0).integers(0, 50, (1, 10)), jnp.int32)
        mel = model.inference(params, token, jnp.asarray([10]), jnp.zeros((1, 20, 80)),
                              jnp.asarray(np.random.default_rng(1).standard_normal((1, 192)), jnp.float32))
        assert mel.shape == (1, 20, 80)
        assert np.isfinite(np.asarray(mel)).all()

    @pytest.mark.slow
    def test_streaming_chunk_equals_full(self, dit_flow):
        """v3 golden test (flow.py:417-443): chunked DiT flow == full pass."""
        model, params = dit_flow
        rng = np.random.default_rng(3)
        max_len, ctx = 4 * CHUNK, model.cfg.pre_lookahead_len
        token = rng.integers(0, 50, (1, max_len))
        prompt_token = rng.integers(0, 50, (1, CHUNK))
        prompt_feat = rng.random((1, CHUNK * 2, 80)).astype(np.float32)
        emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))

        def run(tok_np, finalize):
            full = np.concatenate([prompt_token, tok_np], axis=1)
            if finalize:
                body, context, pad = full, None, ctx
            else:
                body, context, pad = full[:, :-ctx], jnp.asarray(full[:, -ctx:], jnp.int32), 2 * ctx
            body_p = np.concatenate([body, np.zeros((1, pad), body.dtype)], axis=1)
            conds = np.zeros((1, body_p.shape[1] * 2, 80), np.float32)
            conds[:, : prompt_feat.shape[1]] = prompt_feat
            mel = model.inference(
                params, jnp.asarray(body_p, jnp.int32), jnp.asarray([body.shape[1]]),
                jnp.asarray(conds), emb, context_token=context, streaming=True,
            )
            return np.asarray(mel)[:, prompt_feat.shape[1] : body.shape[1] * 2]

        gt = run(token, True)
        for i in range(0, max_len, CHUNK):
            finalize = i + CHUNK + ctx >= max_len
            part = token if finalize else token[:, : i + CHUNK + ctx]
            pred = run(part, finalize)[:, i * 2 :]
            ref = gt[:, i * 2 : i * 2 + pred.shape[1]]
            err = np.abs(pred - ref).max()
            assert err < 2e-3, f"chunk {i}: err {err}"

    def test_partial_rope_only_rotates_head_dims(self):
        from cosyvoice_tpu.models.dit import apply_partial_rope

        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 32)).astype(np.float32))
        y = apply_partial_rope(x, 8)
        np.testing.assert_array_equal(np.asarray(y[..., 8:]), np.asarray(x[..., 8:]))
        assert np.abs(np.asarray(y[..., :8] - x[..., :8]))[0, 1:].max() > 0
        # position 0 unrotated
        np.testing.assert_allclose(np.asarray(y[0, 0, :8]), np.asarray(x[0, 0, :8]), atol=1e-6)
