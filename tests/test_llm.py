import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, TYPE_SPEECH, TYPE_SPECIAL, TYPE_TEXT
from cosyvoice_tpu.models.qwen2 import Qwen2Config

K = jax.random.PRNGKey


@pytest.fixture(scope="module")
def lm():
    cfg = LMConfig(
        speech_token_size=20,
        qwen=Qwen2Config(
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            num_kv_heads=2,
            head_dim=8,
            intermediate_size=64,
            vocab_size=100,
            max_cache_len=128,
            dtype=jnp.float32,
        ),
    )
    model = Qwen2LM(cfg)
    params = model.init(K(0))
    return model, params


class TestQwen2LM:
    def test_prefill_decode_matches_full_forward(self, lm):
        """KV-cache decode must reproduce teacher-forced logits exactly."""
        model, params = lm
        rng = np.random.default_rng(0)
        T = 12
        ids = rng.integers(0, 20, (1, T)).astype(np.int32)
        types = np.full((1, T), TYPE_SPEECH, np.int32)
        full_logits = model.module.apply(
            params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray([T]), method="forward_logits"
        )

        P = 5
        cache = model.init_cache(1)
        logits, cache = model.module.apply(
            params, jnp.asarray(ids[:, :P]), jnp.asarray(types[:, :P]), jnp.asarray([P]), cache, method="prefill"
        )
        np.testing.assert_allclose(np.asarray(logits), np.asarray(full_logits[:, P - 1]), atol=2e-4)

        cur = jnp.asarray([P])
        for t in range(P, T):
            logits, cache = model.module.apply(
                params, jnp.asarray(ids[:, t]), cur, cache, method="decode_step"
            )
            np.testing.assert_allclose(np.asarray(logits), np.asarray(full_logits[:, t]), atol=2e-4)
            cur = cur + 1

    def test_prefill_pad_invariance(self, lm):
        model, params = lm
        rng = np.random.default_rng(1)
        T = 7
        ids = rng.integers(0, 20, (1, T)).astype(np.int32)
        types = np.full((1, T), TYPE_SPEECH, np.int32)

        c1 = model.init_cache(1)
        l1, _ = model.module.apply(params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray([T]), c1, method="prefill")

        padded = np.zeros((1, 16), np.int32)
        padded[:, :T] = ids
        ptypes = np.full((1, 16), TYPE_SPEECH, np.int32)
        c2 = model.init_cache(1)
        l2, _ = model.module.apply(params, jnp.asarray(padded), jnp.asarray(ptypes), jnp.asarray([T]), c2, method="prefill")
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-4)

    def test_mixed_embedding_selects_tables(self, lm):
        model, params = lm
        ids = jnp.asarray([[0, 5, 1, 3]], jnp.int32)
        types = jnp.asarray([[TYPE_SPECIAL, TYPE_TEXT, TYPE_SPECIAL, TYPE_SPEECH]], jnp.int32)
        emb = model.module.apply(params, ids, types, method="embed_input")
        p = params["params"]
        np.testing.assert_allclose(np.asarray(emb[0, 0]), np.asarray(p["llm_embedding"]["embedding"][0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(emb[0, 1]), np.asarray(p["llm"]["embed_tokens"]["embedding"][5]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(emb[0, 3]), np.asarray(p["speech_embedding"]["embedding"][3]), atol=1e-6)

    def test_generate_yields_valid_tokens(self, lm):
        model, params = lm
        prompt_ids = np.asarray([0, 3, 7, 1, 2, 4], np.int32)  # sos, text, text, task, speech...
        prompt_types = np.asarray(
            [TYPE_SPECIAL, TYPE_TEXT, TYPE_TEXT, TYPE_SPECIAL, TYPE_SPEECH, TYPE_SPEECH], np.int32
        )
        out = []
        for block in model.generate(params, prompt_ids, prompt_types, K(3), min_len=4, max_len=12, block_size=6):
            out.extend(block.tolist())
        assert 0 < len(out) <= 12
        assert all(0 <= t < 20 for t in out)


class TestBistream:
    def test_bistream_generation(self, lm):
        """Streaming text input: interleaved feeds + fill handoffs produce
        valid speech tokens and terminate after the final drain."""
        model, params = lm
        rng = np.random.default_rng(0)

        def text_stream():
            for _ in range(3):
                yield rng.integers(0, 20, 4).astype(np.int32)

        prompt_text = rng.integers(0, 20, 3).astype(np.int32)
        prompt_speech = rng.integers(0, 20, 7).astype(np.int32)
        out = []
        for block in model.generate_bistream(
            params, text_stream(), prompt_text, prompt_speech, K(5), max_len=60
        ):
            out.extend(block.tolist())
        assert len(out) > 0
        assert all(0 <= t < 20 for t in out)

    def test_extend_matches_prefill(self, lm):
        """Incremental mixed-segment extend == one-shot prefill logits."""
        model, params = lm
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 20, 10).astype(np.int32)
        types = np.full(10, TYPE_SPEECH, np.int32)

        cache = model.init_cache(1)
        l_ref, _ = model.module.apply(
            params, jnp.asarray(ids[None]), jnp.asarray(types[None]), jnp.asarray([10]), cache, method="prefill"
        )
        cache2 = model.init_cache(1)
        cur = jnp.asarray([0])
        for seg in (slice(0, 4), slice(4, 7), slice(7, 10)):
            l_inc, cache2 = model.module.apply(
                params, jnp.asarray(ids[None, seg]), jnp.asarray(types[None, seg]), cur, cache2, method="extend_mixed"
            )
            cur = cur + (seg.stop - seg.start)
        np.testing.assert_allclose(np.asarray(l_inc), np.asarray(l_ref), atol=2e-4)


class TestZerosLikeInit:
    def test_bench_init_contract(self, lm):
        """bench.py materializes params as on-device zeros (zeros_like_init)
        instead of running flax init — latency of TPU matmuls is
        data-independent, so timings are valid IF the zero-weight model still
        runs finite end-to-end. Assert both halves of that contract: the tree
        matches real init in structure/shape/dtype, and generate() on
        all-zero params emits finite logits / valid tokens."""
        from cosyvoice_tpu.utils.devices import zeros_like_init

        model, real_params = lm
        z_params = zeros_like_init(model.init, K(0))
        flat_r = jax.tree_util.tree_leaves_with_path(real_params)
        flat_z = dict(jax.tree_util.tree_leaves_with_path(z_params))
        assert len(flat_r) == len(flat_z)
        for path, leaf in flat_r:
            assert path in flat_z, path
            assert flat_z[path].shape == leaf.shape and flat_z[path].dtype == leaf.dtype
            assert not np.asarray(flat_z[path]).any()

        ids = np.concatenate([[model.cfg.sos_id], np.zeros(4, np.int32), [model.cfg.task_id]]).astype(np.int32)
        types = np.array([TYPE_SPECIAL] + [TYPE_TEXT] * 4 + [TYPE_SPECIAL], np.int32)
        out = []
        for block in model.generate(z_params, ids, types, K(1), min_len=4, max_len=12):
            out.extend(block.tolist())
        assert all(0 <= t <= model.cfg.speech_token_size + 200 for t in out)
