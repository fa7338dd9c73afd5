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
