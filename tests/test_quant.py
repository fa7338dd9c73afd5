"""Weight-only int8 LM tests (the TRT-LLM int8 weight-only role)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.ops.quant import quantize_lm_params, quantize_tensor

K = jax.random.PRNGKey

QWEN = dict(hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
            intermediate_size=128, vocab_size=100, max_cache_len=128, dtype=jnp.float32)


def lm_pair():
    fp = Qwen2LM(LMConfig(speech_token_size=20, block_size=8, qwen=Qwen2Config(**QWEN)))
    q = Qwen2LM(LMConfig(speech_token_size=20, block_size=8, qwen=Qwen2Config(**QWEN, quant=True)))
    return fp, q


class TestQuantOps:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 128)).astype(np.float32)
        wq, scale = quantize_tensor(w, axis=1)
        assert wq.dtype == np.int8 and scale.shape == (1, 128)
        err = np.abs(w - wq.astype(np.float32) * scale)
        assert (err <= scale * 0.5 + 1e-7).all()  # round-to-nearest bound

    def test_zero_column_safe(self):
        w = np.zeros((8, 4), np.float32)
        wq, scale = quantize_tensor(w, axis=1)
        assert np.isfinite(scale).all() and (wq == 0).all()


class TestQuantLM:
    @pytest.fixture(scope="class")
    def setup(self):
        fp, q = lm_pair()
        params = fp.init(K(0))
        params_q = quantize_lm_params(params)
        return fp, q, params, params_q

    def test_param_tree_matches_quant_module(self, setup):
        """Quantized fp tree must be exactly what the quant module expects."""
        fp, q, params, params_q = setup
        ref = q.init(K(1))
        flat_ref = {jax.tree_util.keystr(k): (v.shape, v.dtype)
                    for k, v in jax.tree_util.tree_leaves_with_path(ref)}
        flat_got = {jax.tree_util.keystr(k): (np.shape(v), np.asarray(v).dtype)
                    for k, v in jax.tree_util.tree_leaves_with_path(params_q)}
        assert flat_ref.keys() == flat_got.keys()
        for k in flat_ref:
            assert flat_ref[k][0] == tuple(flat_got[k][0]), k
            assert flat_ref[k][1] == flat_got[k][1], k

    def test_logits_close_to_fp(self, setup):
        fp, q, params, params_q = setup
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 20, (2, 12)).astype(np.int32)
        types = np.full((2, 12), TYPE_SPEECH, np.int32)
        lengths = np.asarray([12, 9], np.int32)
        lf = np.asarray(fp.module.apply(params, ids, types, lengths, method="forward_logits"))
        lq = np.asarray(q.module.apply(params_q, ids, types, lengths, method="forward_logits"))
        corr = np.corrcoef(lf.ravel(), lq.ravel())[0, 1]
        assert corr > 0.999, corr
        # greedy choice preserved almost everywhere
        agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
        assert agree > 0.9, agree

    def test_quant_generate_runs(self, setup):
        fp, q, params, params_q = setup
        c = q.cfg
        rng = np.random.default_rng(2)
        tt = rng.integers(0, 50, 4).astype(np.int32)
        ids = np.concatenate([[c.sos_id], tt, [c.task_id]]).astype(np.int32)
        types = np.concatenate([[TYPE_SPECIAL], np.full(4, TYPE_TEXT), [TYPE_SPECIAL]]).astype(np.int32)
        blocks = list(q.generate(params_q, ids, types, K(7), 6, 30))
        toks = np.concatenate(blocks)
        assert 6 <= len(toks) <= 30
        assert (toks < c.speech_token_size).all()
