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

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        """The driver's multi-chip validation path on an 8-device CPU mesh."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    @pytest.mark.slow
    def test_dryrun_survives_preinitialized_backend(self):
        """r1 failure mode: an importer initializes a 1-device backend before
        dryrun_multichip runs. The scrubbed-env subprocess must still deliver
        an 8-device mesh."""
        import os
        import re
        import subprocess
        import sys

        env = dict(os.environ)
        # parent gets NO host-device-count flag -> its CPU client has 1 device
        env["XLA_FLAGS"] = re.sub(
            r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        code = (
            "import jax; jax.config.update('jax_platforms','cpu');\n"
            "assert len(jax.devices()) == 1, jax.devices()  # backend now pinned small\n"
            "import __graft_entry__ as ge; ge.dryrun_multichip(8); print('OK8')\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), timeout=1500,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "OK8" in proc.stdout and "ok" in proc.stdout

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
        # cur advances one per non-finished step. With random weights any
        # stop id may be sampled: eos is masked before min_len=4 but the
        # other stop rows are samplable from step 1 (reference-exact v2
        # semantics, llm.py:544-545 — see models/llm.py decode-block notes),
        # so a row may finish after as little as one step.
        adv = np.asarray(cur_n) - np.asarray(cur)
        assert ((adv >= 1) & (adv <= 6)).all()

    def test_fsdp_param_spec(self):
        from cosyvoice_tpu.parallel.sharding import fsdp_param_spec, make_mesh
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh(8, dp=4, tp=2)
        big = np.zeros((256, 128))
        # tp rule wins its axis; dp shards the largest remaining divisible axis
        assert fsdp_param_spec("llm/layers_0/self_attn/q_proj/kernel", big, mesh) == P("dp", "tp")
        assert fsdp_param_spec("llm/layers_0/self_attn/o_proj/kernel", big, mesh) == P("tp", "dp")
        # un-ruled big param: dp on largest divisible axis
        assert fsdp_param_spec("flow/whatever/kernel", big, mesh) == P("dp", None)
        # small params stay replicated
        assert fsdp_param_spec("llm/norm/weight", np.zeros((8,)), mesh) == P()

    def test_fsdp_train_step(self):
        """FSDP (ZeRO-3 analog): params sharded along dp, train step runs and
        matches the replicated-params loss."""
        import __graft_entry__ as ge
        from cosyvoice_tpu.parallel.sharding import (
            make_mesh, shard_accum_batch, shard_params_fsdp, shard_opt_state_zero, fsdp_param_spec,
        )
        from cosyvoice_tpu.train.trainer import make_lm_train_step, make_optimizer
        from cosyvoice_tpu.train.losses import IGNORE_ID

        lm = ge._lm(tiny=True)
        mesh = make_mesh(8, dp=4, tp=2)
        params = lm.init(jax.random.PRNGKey(0))

        optimizer = make_optimizer()
        rng = np.random.default_rng(0)
        accum, B, T = 1, 8, 24
        ids = rng.integers(0, 50, (accum, B, T)).astype(np.int32)
        types = np.ones((accum, B, T), np.int32)
        targets = rng.integers(0, 50, (accum, B, T)).astype(np.int32)
        targets[:, :, :4] = IGNORE_ID
        lengths = np.full((accum, B), T, np.int32)
        batch = {"ids": ids, "types": types, "targets": targets, "lengths": lengths}

        step = make_lm_train_step(lm.module, optimizer, accum_steps=accum)
        _, _, m_ref = step(params, optimizer.init(params), batch, jnp.asarray(0))

        fs_params = shard_params_fsdp(mesh, lm.init(jax.random.PRNGKey(0)))
        fs_opt = shard_opt_state_zero(mesh, optimizer.init(fs_params), fs_params, rule=fsdp_param_spec)
        fs_batch = shard_accum_batch(mesh, batch)
        step2 = make_lm_train_step(lm.module, optimizer, mesh=mesh, accum_steps=accum)
        with jax.set_mesh(mesh):
            fs_params, fs_opt, m = step2(fs_params, fs_opt, fs_batch, jnp.asarray(0))
        assert np.isfinite(float(m["loss"]))
        np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]), rtol=1e-4)


class TestPipelineParallel:
    def _tiny(self):
        from cosyvoice_tpu.models.qwen2 import Qwen2Config, Qwen2Layer

        cfg = Qwen2Config(hidden_size=32, num_layers=4, num_heads=2, num_kv_heads=1,
                          head_dim=16, intermediate_size=64, vocab_size=64,
                          max_cache_len=64, dtype=jnp.float32)
        layer = Qwen2Layer(cfg)
        rng = np.random.default_rng(0)
        T = 8
        x = jnp.asarray(rng.standard_normal((4, T, 32)), jnp.float32)
        cos = jnp.asarray(rng.standard_normal((T, 8)), jnp.float32)
        sin = jnp.asarray(rng.standard_normal((T, 8)), jnp.float32)
        bias = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e30)[None, None].astype(jnp.float32)
        lps = [layer.init(jax.random.PRNGKey(i), x, cos, sin, bias)["params"]
               for i in range(cfg.num_layers)]
        return cfg, lps, x, (cos, sin, bias)

    def test_pipeline_matches_sequential(self):
        from jax.sharding import Mesh
        from cosyvoice_tpu.parallel.pipeline import (
            pipeline_forward, qwen2_layer_fn, shard_stacked_layers, stack_layer_params,
        )

        cfg, lps, x, bc = self._tiny()
        fn = qwen2_layer_fn(cfg)
        ref = x
        for lp in lps:
            ref = fn(lp, ref, *bc)

        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("pp",))
        stacked = shard_stacked_layers(mesh, stack_layer_params(lps))
        got = pipeline_forward(mesh, fn, stacked, x, bcast=bc, n_micro=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_pipeline_grad_matches_sequential(self):
        from jax.sharding import Mesh
        from cosyvoice_tpu.parallel.pipeline import (
            pipeline_forward, qwen2_layer_fn, shard_stacked_layers, stack_layer_params,
        )

        cfg, lps, x, bc = self._tiny()
        fn = qwen2_layer_fn(cfg)
        mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("pp",))
        stacked_host = stack_layer_params(lps)
        stacked = shard_stacked_layers(mesh, stacked_host)

        def loss_pp(sp):
            y = pipeline_forward(mesh, fn, sp, x, bcast=bc, n_micro=2)
            return jnp.mean(jnp.square(y))

        def loss_seq(sp):
            def one(h, lp):
                return fn(lp, h, *bc), None

            y, _ = jax.lax.scan(one, x, sp)
            return jnp.mean(jnp.square(y))

        g_pp = jax.jit(jax.grad(loss_pp))(stacked)
        g_seq = jax.jit(jax.grad(loss_seq))(stacked_host)
        flat_pp = jax.tree_util.tree_leaves(g_pp)
        flat_seq = jax.tree_util.tree_leaves(g_seq)
        for a, b in zip(flat_pp, flat_seq):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3, atol=3e-3)
