"""Declarative config system (utils/config.py) + recipe configs + parquet packing."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfigBuild:
    def test_recipe_configs_build(self):
        from cosyvoice_tpu.utils.config import build_model_configs, load_config

        for name, sr in [("cosyvoice", 22050), ("cosyvoice2", 24000), ("cosyvoice3", 24000)]:
            cfg = load_config(os.path.join(REPO, "examples", "libritts", name, "conf", f"{name}.json"))
            lm, flow, hift = build_model_configs(cfg)
            assert hift.sampling_rate == sr
            if name == "cosyvoice2":
                assert lm.qwen.num_layers == 24 and lm.qwen.num_kv_heads == 2
                assert flow.estimator.num_mid_blocks == 12 and flow.estimator.causal
            if name == "cosyvoice3":
                assert lm.special_in_speech_table and lm.num_special_head == 200
                assert flow.estimator_type == "dit" and flow.dit.depth == 22
                assert hift.causal
            if name == "cosyvoice":
                assert lm.speech_token_size == 4096 and flow.input_frame_rate == 50

    def test_unknown_field_rejected(self):
        from cosyvoice_tpu.utils.config import build_lm_config

        with pytest.raises(ValueError, match="unknown"):
            build_lm_config({"not_a_field": 1})

    def test_dtype_and_tuple_coercion(self):
        import jax.numpy as jnp

        from cosyvoice_tpu.utils.config import build_hift_config, build_lm_config

        lm = build_lm_config({"qwen": {"dtype": "float32"}})
        assert lm.qwen.dtype == jnp.float32
        h = build_hift_config({"resblock_dilations": [[1, 3, 5], [1, 3, 5], [1, 3, 5]]})
        assert h.resblock_dilations == ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    def test_api_reads_model_dir_config(self, tmp_path):
        """CosyVoice2(model_dir) builds its configs from config.json (the
        reference's model-dir yaml role, cli/cosyvoice.py:150)."""
        from cosyvoice_tpu.runtime.api import CosyVoice2

        cfg = {
            "version": 2,
            "llm": {
                "speech_token_size": 64,
                "block_size": 8,
                "qwen": {
                    "hidden_size": 32, "num_layers": 1, "num_heads": 2, "num_kv_heads": 1,
                    "head_dim": 16, "intermediate_size": 64, "vocab_size": 128,
                    "max_cache_len": 256, "dtype": "float32",
                },
            },
            "flow": {
                "input_size": 32, "vocab_size": 64, "attention_heads": 2, "linear_units": 64,
                "num_blocks": 1, "num_up_blocks": 1,
                "estimator": {"channels": [32], "n_blocks": 1, "num_mid_blocks": 1, "num_heads": 2},
                "cfm": {"n_timesteps": 2},
            },
            "hift": {"base_channels": 32, "upsample_rates": [8, 5, 3], "upsample_kernel_sizes": [16, 11, 7]},
            # tiny frontend too — without this section load_frontend falls
            # back to the full-size S3/CAM++ init, which dominates the test
            "frontend": {
                "s3": {"n_mels": 32, "d_model": 32, "num_heads": 2, "num_layers": 1,
                       "fsq_levels": [3, 3, 3, 3], "codebook_size": 64, "use_fsq": True}
            },
        }
        (tmp_path / "config.json").write_text(json.dumps(cfg))
        model = CosyVoice2(str(tmp_path))
        assert model.lm.cfg.speech_token_size == 64
        assert model.lm.cfg.qwen.hidden_size == 32
        assert model.flow.cfg.input_size == 32
        assert model.hift.cfg.base_channels == 32


class TestTrainConfigFlag:
    def test_config_sets_train_defaults_cli_wins(self, tmp_path):
        """--config's train section becomes argparse defaults; explicit flags win."""
        cfg = {"train": {"lr": 3e-4, "max_epoch": 7}}
        p = tmp_path / "c.json"
        p.write_text(json.dumps(cfg))
        code = (
            "import sys; sys.argv = ['train.py', '--config', %r, '--model', 'llm', "
            "'--train_data', 'x', '--model_dir', 'y', '--lr', '9e-5']\n"
            "import argparse\n"
            "from cosyvoice_tpu.bin import train as T\n"
            "orig = argparse.ArgumentParser.parse_args\n"
            "def spy(self, *a, **k):\n"
            "    ns = orig(self, *a, **k)\n"
            "    if hasattr(ns, 'lr'): print('LR', ns.lr, 'EPOCH', ns.max_epoch); sys.exit(0)\n"
            "    return ns\n"
            "argparse.ArgumentParser.parse_args = spy\n"
            "T.main()\n"
        ) % str(p)
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                           env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd=REPO, timeout=120)
        assert "LR 9e-05 EPOCH 7" in r.stdout, r.stdout + r.stderr


class TestParquetPacking:
    def _write_dir(self, d, utts, reject=False, instruct=False):
        os.makedirs(d, exist_ok=True)
        from cosyvoice_tpu.utils.audio_io import save_wav

        with open(f"{d}/wav.scp", "w") as w, open(f"{d}/text", "w") as t:
            for u in utts:
                path = f"{d}/{u}.wav"
                save_wav(path, np.random.RandomState(0).randn(2400).astype(np.float32) * 0.1, 24000)
                w.write(f"{u} {path}\n")
                t.write(f"{u} hello world\n")
        with open(f"{d}/utt2embedding.pkl", "wb") as f:
            pickle.dump({u: np.zeros(192, np.float32) for u in utts}, f)
        with open(f"{d}/utt2speech_token.pkl", "wb") as f:
            pickle.dump({u: [1, 2, 3] for u in utts}, f)
        if instruct:
            with open(f"{d}/instruct", "w") as f:
                for u in utts:
                    f.write(f"{u} speak softly\n")

    def test_dpo_and_instruct_columns(self, tmp_path):
        pytest.importorskip("pyarrow")
        src = str(tmp_path / "data")
        self._write_dir(src, ["u1", "u2"], instruct=True)
        self._write_dir(src + "_reject", ["u1", "u2"])
        with open(f"{src}_reject/utt2speech_token.pkl", "wb") as f:
            pickle.dump({"u1": [9, 9], "u2": [8, 8]}, f)
        out = str(tmp_path / "parquet")
        r = subprocess.run(
            [sys.executable, "-m", "cosyvoice_tpu.tools.make_parquet_list", "--src_dir", src,
             "--des_dir", out, "--dpo", "--num_utts_per_parquet", "10"],
            capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"}, cwd=REPO, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        import pyarrow.parquet as pq

        shard = open(f"{out}/data.list").read().split()[0]
        table = pq.read_table(shard).to_pydict()
        assert table["reject_speech_token"] == [[9, 9], [8, 8]]
        assert table["instruct"] == ["speak softly", "speak softly"]
