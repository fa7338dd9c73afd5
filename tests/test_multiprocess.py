"""Multi-HOST training validation: two real OS processes form one
jax.distributed world (2 procs x 4 virtual CPU devices = 8-device global
mesh) and run one pjit LM train step on process-sharded data.

This is the multi-node test harness the reference lacks (SURVEY §4): the
torchrun/NCCL role is jax.distributed.initialize + GSPMD over the global
mesh; each process feeds only its addressable shard (the fixed-shard data
split that replaces the reference's gloo join barrier, SURVEY §5.8)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.train.losses import IGNORE_ID
from cosyvoice_tpu.train.trainer import make_lm_train_step, make_optimizer
from cosyvoice_tpu.parallel.sharding import shard_params

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 2 procs x 4 local

lm = Qwen2LM(LMConfig(speech_token_size=50, qwen=Qwen2Config(
    hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
    intermediate_size=128, vocab_size=256, max_cache_len=128, dtype=jnp.float32)))
mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))

params = shard_params(mesh, lm.init(jax.random.PRNGKey(0)))
optimizer = make_optimizer()
opt_state = jax.jit(optimizer.init, out_shardings=None)(params)

accum, B, T = 1, 8, 16  # global batch 8 -> 4 rows per process
rng = np.random.default_rng(0)  # SAME seed: global arrays agree across procs
ids = rng.integers(0, 50, (accum, B, T)).astype(np.int32)
types = np.ones((accum, B, T), np.int32)
targets = rng.integers(0, 50, (accum, B, T)).astype(np.int32)
targets[:, :, :2] = IGNORE_ID
lengths = np.full((accum, B), T, np.int32)

def host_local(x):
    # each process materializes ONLY its addressable rows of the dp axis
    sh = NamedSharding(mesh, P(None, "dp"))
    return jax.make_array_from_process_local_data(sh, x[:, jax.process_index() * (B // 2):(jax.process_index() + 1) * (B // 2)])

batch = {k: host_local(v) for k, v in
         dict(ids=ids, types=types, targets=targets, lengths=lengths).items()}

step = make_lm_train_step(lm.module, optimizer, mesh=mesh, accum_steps=accum)
with jax.set_mesh(mesh):
    params, opt_state, metrics = step(params, opt_state, batch, jnp.asarray(0))
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
print(f"PROC{jax.process_index()} loss={loss:.6f}", flush=True)
"""


class TestMultiProcessTraining:
    @pytest.mark.slow
    def test_two_process_train_step(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = {
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "COORD": f"127.0.0.1:{port}",
            "PYTHONPATH": repo,
        }
        procs = []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env={**env, "PROC_ID": str(pid)},
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, cwd=repo,
            ))
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, o[-3000:]
        losses = []
        for o in outs:
            line = [ln for ln in o.splitlines() if ln.startswith("PROC")][0]
            losses.append(float(line.split("loss=")[1]))
        # the step is one global program: both hosts must compute the SAME loss
        assert abs(losses[0] - losses[1]) < 1e-6, losses
