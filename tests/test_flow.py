import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
from cosyvoice_tpu.models.flow_matching import CFMConfig

K = jax.random.PRNGKey
CHUNK = 5


@pytest.fixture(scope="module")
def flow():
    cfg = FlowConfig(
        input_size=32,
        vocab_size=50,
        chunk_size=CHUNK,
        attention_heads=2,
        linear_units=64,
        num_blocks=1,
        num_up_blocks=1,
        estimator=EstimatorConfig(
            channels=(32,),
            attention_head_dim=8,
            n_blocks=1,
            num_mid_blocks=1,
            num_heads=2,
            static_chunk_size=CHUNK * 2,
            causal=True,
        ),
        cfm=CFMConfig(n_timesteps=4),
    )
    model = CausalFlow(cfg)
    params = model.init(K(0))
    return model, params


def make_conds(prompt_feat, total_tokens):
    conds = np.zeros((1, total_tokens * 2, 80), np.float32)
    conds[:, : prompt_feat.shape[1]] = prompt_feat
    return jnp.asarray(conds)


class TestCausalFlow:
    def test_inference_shape(self, flow):
        model, params = flow
        token = jnp.asarray(np.random.default_rng(0).integers(0, 50, (1, 10)), jnp.int32)
        conds = jnp.zeros((1, 20, 80))
        emb = jnp.asarray(np.random.default_rng(1).standard_normal((1, 192)).astype(np.float32))
        mel = model.inference(params, token, jnp.asarray([10]), conds, emb)
        assert mel.shape == (1, 20, 80)
        assert np.isfinite(np.asarray(mel)).all()

    @pytest.mark.slow
    def test_streaming_chunk_equals_full(self, flow):
        """Reference golden test (flow.py:417-443): chunked streaming flow
        inference must match full streaming inference on the shared prefix."""
        model, params = flow
        rng = np.random.default_rng(3)
        max_len, ctx = 4 * CHUNK, model.cfg.pre_lookahead_len
        token = rng.integers(0, 50, (1, max_len))
        prompt_token = rng.integers(0, 50, (1, CHUNK))
        prompt_feat = rng.random((1, CHUNK * 2, 80)).astype(np.float32)
        emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))

        def run(tok_np, finalize):
            full_tok = np.concatenate([prompt_token, tok_np], axis=1)
            if finalize:
                body, context = full_tok, None
                pad = ctx  # keep array shape T >= len+ctx like the engine would
            else:
                body, context = full_tok[:, :-ctx], jnp.asarray(full_tok[:, -ctx:], jnp.int32)
                pad = 2 * ctx
            body_p = np.concatenate([body, np.zeros((1, pad), body.dtype)], axis=1)
            conds = make_conds(prompt_feat, body_p.shape[1])
            mel = model.inference(
                params,
                jnp.asarray(body_p, jnp.int32),
                jnp.asarray([body.shape[1]]),
                conds,
                emb,
                context_token=context,
                streaming=True,
            )
            return np.asarray(mel)[:, prompt_feat.shape[1] : body.shape[1] * 2]

        gt = run(token, True)
        for i in range(0, max_len, CHUNK):
            finalize = i + CHUNK + ctx >= max_len
            part = token[:, : max_len] if finalize else token[:, : i + CHUNK + ctx]
            pred = run(part, finalize)
            pred_new = pred[:, i * 2:]
            ref = gt[:, i * 2 : i * 2 + pred_new.shape[1]]
            err = np.abs(pred_new - ref).max()
            assert err < 2e-3, f"chunk {i}: err {err}"

    def test_tail_padding_invariance(self, flow):
        """Bucketed (tail-padded) inference must equal exact-length inference
        in the valid region — the property the engine's bucketing relies on."""
        model, params = flow
        rng = np.random.default_rng(5)
        L = 8
        token = rng.integers(0, 50, (1, L))
        emb = jnp.asarray(rng.standard_normal((1, 192)).astype(np.float32))
        conds = jnp.zeros((1, 2 * L, 80))
        mel_exact = np.asarray(model.inference(params, jnp.asarray(token, jnp.int32), jnp.asarray([L]), conds, emb))

        pad = 4
        token_p = np.concatenate([token, np.zeros((1, pad), np.int64)], axis=1)
        conds_p = jnp.zeros((1, 2 * (L + pad), 80))
        mel_pad = np.asarray(
            model.inference(params, jnp.asarray(token_p, jnp.int32), jnp.asarray([L]), conds_p, emb)
        )
        np.testing.assert_allclose(mel_pad[:, : 2 * L], mel_exact, atol=2e-4)
        assert np.abs(mel_pad[:, 2 * L :]).max() == 0.0

    def test_loss_runs(self, flow):
        model, params = flow
        rng = np.random.default_rng(7)
        token = jnp.asarray(rng.integers(0, 50, (2, 10)), jnp.int32)
        feat = jnp.asarray(rng.standard_normal((2, 20, 80)).astype(np.float32))
        emb = jnp.asarray(rng.standard_normal((2, 192)).astype(np.float32))
        loss = model.loss(
            params, K(1), token, jnp.asarray([10, 8]), feat, jnp.asarray([20, 16]), emb, streaming=False
        )
        assert np.isfinite(float(loss))
