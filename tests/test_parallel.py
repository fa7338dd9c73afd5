import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestMultichip:
    def test_mesh_shapes(self):
        from cosyvoice_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(8)
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("dp", "tp")

    def test_dryrun_multichip(self):
        """The driver's multi-chip validation path on an 8-device CPU mesh."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.ndim == 3 and np.isfinite(np.asarray(out)).all()

    def test_param_specs_tp_sharding(self):
        from cosyvoice_tpu.parallel.sharding import lm_param_spec
        from jax.sharding import PartitionSpec as P

        x2 = np.zeros((4, 8))
        assert lm_param_spec("llm/layers_0/self_attn/q_proj/kernel", x2, None) == P(None, "tp")
        assert lm_param_spec("llm/layers_0/self_attn/o_proj/kernel", x2, None) == P("tp", None)
        assert lm_param_spec("llm/layers_0/mlp/down_proj/kernel", x2, None) == P("tp", None)
        assert lm_param_spec("llm/norm/weight", np.zeros((8,)), None) == P()

    def test_tp_serving_decode(self):
        """Multi-chip serving: prefill + block decode with tp-sharded params
        and a dp/tp-sharded KV arena matches the single-device path."""
        import __graft_entry__ as ge
        from cosyvoice_tpu.parallel.sharding import make_mesh, shard_lm_serving

        lm = ge._lm(tiny=True)
        params = lm.init(jax.random.PRNGKey(0))
        B, T = 2, 16
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 50, (B, T)), jnp.int32)
        types = jnp.ones((B, T), jnp.int32)
        tl = jnp.asarray([T, T - 3], jnp.int32)

        cache0 = lm.init_cache(B, length=64)
        logits_ref, cache_ref = lm._jit_prefill(params, ids, types, tl, cache0)

        mesh = make_mesh(4, dp=2, tp=2)  # tiny model: 4 heads / 2 kv heads
        sp, sc = shard_lm_serving(mesh, params, lm.init_cache(B, length=64))
        logits_tp, cache_tp = lm._jit_prefill(sp, ids, types, tl, sc)
        np.testing.assert_allclose(
            np.asarray(logits_tp), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
        )

        # one ragged decode block executes under the mesh (collectives inserted)
        cur = tl.astype(jnp.int32)
        rec = jnp.full((B, lm.cfg.win_size), -1, jnp.int32)
        nd = jnp.zeros((B,), jnp.int32)
        ml = jnp.full((B,), 4, jnp.int32)
        fin = jnp.zeros((B,), bool)
        toks, logits_n, cache_n, cur_n, *_ = lm._jit_decode_block(
            sp, jax.random.PRNGKey(1), cache_tp, cur, logits_tp, rec, nd, ml, fin, 6, ragged=True
        )
        assert toks.shape == (B, 6)
        assert np.isfinite(np.asarray(logits_n)).all()
        # cur advances one per non-finished step (a stop id may be sampled
        # after min_len with random weights)
        adv = np.asarray(cur_n) - np.asarray(cur)
        assert ((adv >= 4) & (adv <= 6)).all()
