import os
import random

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, TYPE_SPECIAL, TYPE_SPEECH, TYPE_TEXT
from cosyvoice_tpu.models.qwen2 import Qwen2Config
from cosyvoice_tpu.train.lm_data import build_lm_sample, collate_lm_batch, dpo_loss, sequence_logps
from cosyvoice_tpu.train.losses import IGNORE_ID, lm_ce_loss
from cosyvoice_tpu.train.schedulers import get_scheduler
from cosyvoice_tpu.train.trainer import make_lm_train_step, make_optimizer

K = jax.random.PRNGKey


def tiny_lm():
    return Qwen2LM(
        LMConfig(
            speech_token_size=20,
            qwen=Qwen2Config(
                hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                intermediate_size=64, vocab_size=100, max_cache_len=128, dtype=jnp.float32,
            ),
        )
    )


class TestLMData:
    def test_unistream_layout(self):
        cfg = LMConfig(speech_token_size=20)
        rng = random.Random(1)  # .random() > 0.5 first draw -> unistream

        class NoBi(random.Random):
            def random(self):
                return 0.9

        text = np.arange(5)
        speech = np.arange(10)
        ids, types, tgt = build_lm_sample(cfg, text, speech, rng=NoBi())
        assert len(ids) == 1 + 5 + 1 + 10
        assert types[0] == TYPE_SPECIAL and ids[0] == cfg.sos_id
        assert (tgt[: 1 + 5] == IGNORE_ID).all()
        assert tgt[6] == speech[0]  # task position predicts first speech token
        assert tgt[-1] == cfg.eos_token

    def test_bistream_layout(self):
        cfg = LMConfig(speech_token_size=100)

        class Bi(random.Random):
            def random(self):
                return 0.1

        text = np.arange(5)
        speech = np.arange(40)  # 40/5 = 8 > 15/5 = 3 -> eligible
        ids, types, tgt = build_lm_sample(cfg, text, speech, rng=Bi())
        # first block: sos + 5 text + 15 speech
        assert (types[1:6] == TYPE_TEXT).all()
        assert (types[6:21] == TYPE_SPEECH).all()
        assert tgt[5 + 15] == cfg.fill_token  # block end target is fill
        assert tgt[-1] == cfg.eos_token

    def test_collate_shapes(self):
        cfg = LMConfig(speech_token_size=20)
        batch = {
            "text_token": np.ones((2, 6), np.int32),
            "text_token_len": np.asarray([6, 4], np.int32),
            "speech_token": np.ones((2, 12), np.int32),
            "speech_token_len": np.asarray([12, 8], np.int32),
        }
        out = collate_lm_batch(cfg, batch, rng=random.Random(0))
        assert out["ids"].shape == out["targets"].shape == out["types"].shape
        assert out["ids"].shape[1] % 8 == 0
        assert (out["lengths"] > 0).all()


class TestTrainStep:
    def test_lm_train_step_reduces_loss(self):
        lm = tiny_lm()
        params = lm.init(K(0))
        opt = make_optimizer(lr=1e-2, scheduler="constantlr")
        opt_state = opt.init(params)
        step = make_lm_train_step(lm.module, opt)
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 20, (1, 2, 16)).astype(np.int32)
        types = np.full((1, 2, 16), TYPE_SPEECH, np.int32)
        targets = rng.integers(0, 20, (1, 2, 16)).astype(np.int32)
        lengths = np.full((1, 2), 16, np.int32)
        batch = {"ids": jnp.asarray(ids), "types": jnp.asarray(types), "targets": jnp.asarray(targets), "lengths": jnp.asarray(lengths)}
        losses = []
        for i in range(8):
            params, opt_state, metrics = step(params, opt_state, batch, jnp.asarray(i))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]

    def test_ce_loss_matches_torch(self):
        import torch

        rng = np.random.default_rng(0)
        logits = rng.standard_normal((2, 7, 11)).astype(np.float32)
        targets = rng.integers(0, 11, (2, 7))
        targets[0, :3] = IGNORE_ID
        ours, acc = lm_ce_loss(jnp.asarray(logits), jnp.asarray(targets))
        theirs = torch.nn.functional.cross_entropy(
            torch.from_numpy(logits).reshape(-1, 11), torch.from_numpy(targets).reshape(-1),
            ignore_index=IGNORE_ID,
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    def test_schedulers(self):
        w = get_scheduler("warmuplr", 1e-3, warmup_steps=100)
        assert w(50) < w(100)
        assert w(100) > w(400)
        c = get_scheduler("constantlr", 1e-4)
        assert c(1) == c(1000) == 1e-4
        n = get_scheduler("NoamHoldAnnealing", 1e-3, warmup_steps=10, hold_steps=10)
        assert n(5) < n(10) and abs(n(15) - 1e-3) < 1e-9 and n(100) < 1e-3
        # NeMo-family policies (reference scheduler.py:377-738)
        sq = get_scheduler("SquareAnnealing", 1e-3, max_steps=100)
        assert sq(10) > sq(50) > sq(100) == 0.0
        sr = get_scheduler("SquareRootAnnealing", 1e-3, max_steps=100)
        assert sr(50) > sq(50)  # sqrt decays slower than square
        na = get_scheduler("NoamAnnealing", 1e-3, d_model=512, warmup_steps=10)
        assert na(5) < na(10) > na(100)
        pd = get_scheduler("PolynomialDecayAnnealing", 1e-3, decay_steps=100, power=1.0)
        np.testing.assert_allclose(pd(50), 5e-4, rtol=1e-6)
        wa = get_scheduler("WarmupAnnealing", 1e-3, warmup_steps=10, max_steps=100)
        assert abs(wa(10) - 1e-3) < 1e-9 and wa(200) == 0.0
        np.testing.assert_allclose(float(wa(55)), 5e-4, rtol=1e-5)  # linear midpoint
        lwc = get_scheduler("linear_warmup_cosine_annealing", 1e-3, warmup_steps=10, decay_steps=100)
        assert abs(lwc(10) - 1e-3) < 1e-9 and lwc(200) == 0.0
        sc = get_scheduler("SquareRootConstantPolicy", 1e-3, constant_steps=10)
        assert sc(5) == 1e-3 and abs(sc(100) - 1e-4) < 1e-9


class TestDPO:
    def test_dpo_loss_direction(self):
        better = dpo_loss(jnp.asarray([0.0]), jnp.asarray([-2.0]), jnp.asarray([0.0]), jnp.asarray([0.0]))
        worse = dpo_loss(jnp.asarray([-2.0]), jnp.asarray([0.0]), jnp.asarray([0.0]), jnp.asarray([0.0]))
        assert float(better) < float(worse)

    def test_sequence_logps(self):
        logits = jnp.zeros((1, 4, 5))
        targets = jnp.asarray([[1, 2, IGNORE_ID, IGNORE_ID]])
        lp = sequence_logps(logits, targets)
        np.testing.assert_allclose(float(lp[0]), np.log(1 / 5), rtol=1e-5)


class TestGAN:
    @pytest.mark.slow
    def test_gan_steps_run(self):
        from cosyvoice_tpu.models.discriminator import MultipleDiscriminator
        from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator
        from cosyvoice_tpu.train.gan import GanLossConfig, make_gan_train_steps

        hift = HiFTGenerator(
            HiFTConfig(
                base_channels=32, resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
                source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)),
            )
        )
        disc = MultipleDiscriminator()
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, 80)), jnp.float32)
        wav = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6 * 480)) * 0.1, jnp.float32)
        gen_params = hift.init(K(0), mel, K(1))
        disc_params = disc.init(K(2), wav)
        g_opt = optax.adam(2e-4)
        d_opt = optax.adam(2e-4)
        gen_step, disc_step = make_gan_train_steps(hift, disc, g_opt, d_opt)
        batch = {"speech": wav, "speech_feat": mel, "pitch_feat": jnp.abs(wav[:, : 6 * 480 : 480]) * 100}
        gp, gos, gm = gen_step(gen_params, g_opt.init(gen_params), disc_params, batch, K(3))
        dp, dos, dm = disc_step(disc_params, d_opt.init(disc_params), gp, batch, K(4))
        assert np.isfinite(float(gm["loss"])) and np.isfinite(float(dm["loss"]))


class TestDataPipeline:
    def test_processors_end_to_end(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from functools import partial

        from cosyvoice_tpu.data import processor as P
        from cosyvoice_tpu.data.dataset import Dataset
        from cosyvoice_tpu.frontend.tokenizer import ByteFallbackTokenizer

        rng = np.random.default_rng(0)
        rows = {
            "utt": [f"u{i}" for i in range(4)],
            "text": ["hello world"] * 4,
            "audio": [rng.standard_normal(24000).astype(np.float32) * 0.1 for _ in range(4)],
            "sample_rate": [24000] * 4,
            "utt_embedding": [rng.standard_normal(192).astype(np.float32) for _ in range(4)],
            "speech_token": [rng.integers(0, 6561, 25) for _ in range(4)],
        }
        path = tmp_path / "shard0.parquet"
        pq.write_table(pa.table({k: list(v) for k, v in rows.items()}), path)
        listfile = tmp_path / "data.list"
        listfile.write_text(str(path) + "\n")

        tok = ByteFallbackTokenizer()
        pipeline = [
            P.parquet_opener,
            partial(P.tokenize, tokenizer=tok),
            partial(P.filter_samples, max_length=6000, min_length=10),
            partial(P.resample, resample_rate=24000),
            partial(P.compute_fbank),
            partial(P.parse_embedding),
            partial(P.shuffle, shuffle_size=10),
            partial(P.sort_by_len, sort_size=4),
            partial(P.batch, batch_type="dynamic", max_frames_in_batch=200),
            P.padding,
        ]
        ds = Dataset(str(listfile), pipeline)
        batches = list(iter(ds))
        assert len(batches) >= 1
        b = batches[0]
        assert b["speech_feat"].ndim == 3 and b["speech_feat"].shape[-1] == 80
        assert b["speech_token"].shape[0] == b["embedding"].shape[0]


class TestOnlineFeatures:
    def test_online_token_extraction(self):
        from cosyvoice_tpu.models.speech_tokenizer import S3TokenizerConfig
        from cosyvoice_tpu.train.online_features import OnlineSpeechTokenExtractor

        ex = OnlineSpeechTokenExtractor(
            cfg=S3TokenizerConfig(d_model=32, num_heads=2, num_layers=1, fsq_levels=(3,) * 4, codebook_size=81)
        )
        rng = np.random.default_rng(0)
        batch = {
            "whisper_feat": rng.standard_normal((2, 100, 128)).astype(np.float32),
            "whisper_feat_len": np.asarray([100, 60], np.int32),
        }
        out = ex.add_to_batch(batch)
        assert out["speech_token"].shape[0] == 2
        assert out["speech_token_len"][0] == 25  # 100 Hz -> 25 Hz
        assert (out["speech_token"] >= 0).all() and (out["speech_token"] < 81).all()
        # idempotent when tokens already present
        again = ex.add_to_batch(out)
        assert again is out or "speech_token" in again


class TestTrainCLI:
    def test_train_llm_one_epoch_with_cv(self, tmp_path):
        """bin/train.py end-to-end: tiny LLM, 1 epoch over a tiny parquet with
        --cv_data wired — checkpoint + sidecar json with cv_loss written."""
        import json as _json
        import os
        import subprocess
        import sys

        import pyarrow as pa
        import pyarrow.parquet as pq

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rng = np.random.default_rng(0)
        rows = {
            "utt": [f"u{i}" for i in range(4)],
            "text": ["hello world"] * 4,
            "audio": [rng.standard_normal(24000).astype(np.float32) * 0.1 for _ in range(4)],
            "sample_rate": [24000] * 4,
            "utt_embedding": [rng.standard_normal(192).astype(np.float32) for _ in range(4)],
            "speech_token": [rng.integers(0, 64, 25) for _ in range(4)],
        }
        path = tmp_path / "shard0.parquet"
        pq.write_table(pa.table({k: list(v) for k, v in rows.items()}), path)
        (tmp_path / "data.list").write_text(str(path) + "\n")
        cfg = {
            "llm": {
                "speech_token_size": 64, "block_size": 8,
                "qwen": {"hidden_size": 32, "num_layers": 1, "num_heads": 2, "num_kv_heads": 1,
                         "head_dim": 16, "intermediate_size": 64, "vocab_size": 300,
                         "max_cache_len": 256, "dtype": "float32"},
            },
            "train": {"max_epoch": 1, "log_interval": 1, "batch_type": "static", "batch_size": 2},
        }
        (tmp_path / "cfg.json").write_text(_json.dumps(cfg))
        out_dir = tmp_path / "exp"
        r = subprocess.run(
            [sys.executable, "-m", "cosyvoice_tpu.bin.train", "--model", "llm",
             "--config", str(tmp_path / "cfg.json"),
             "--train_data", str(tmp_path / "data.list"), "--cv_data", str(tmp_path / "data.list"),
             "--model_dir", str(out_dir)],
            capture_output=True, text=True, timeout=1500, cwd=repo,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-3000:]
        sides = [f for f in os.listdir(out_dir) if f.endswith(".json") and "epoch1" in f]
        assert sides, os.listdir(out_dir)
        side = _json.load(open(out_dir / sides[0]))
        assert "cv_loss" in side and np.isfinite(side["cv_loss"])


class TestFlowAccum:
    @pytest.mark.slow
    def test_flow_train_step_accum_matches_mean(self):
        """accum_steps=2 over [A,B,...] microbatches == averaged grads: loss
        reported equals the mean of the two microbatch losses."""
        from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
        from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig
        from cosyvoice_tpu.train.trainer import make_flow_train_step

        flow = CausalFlow(FlowConfig(
            input_size=16, vocab_size=30, attention_heads=2, linear_units=32, num_blocks=1,
            num_up_blocks=1,
            estimator=EstimatorConfig(channels=(16,), attention_head_dim=8, n_blocks=1,
                                      num_mid_blocks=1, num_heads=2),
            cfm=CFMConfig(n_timesteps=1),
        ))
        params = flow.init(K(0))
        opt = optax.adam(1e-4)
        rng = np.random.default_rng(0)
        A, B, L = 2, 2, 6
        batch = {
            "token": jnp.asarray(rng.integers(0, 30, (A, B, L)), jnp.int32),
            "token_len": jnp.full((A, B), L, jnp.int32),
            "feat": jnp.asarray(rng.standard_normal((A, B, 2 * L, 80)), jnp.float32),
            "feat_len": jnp.full((A, B), 2 * L, jnp.int32),
            "embedding": jnp.asarray(rng.standard_normal((A, B, 192)), jnp.float32),
        }
        # reference: per-microbatch losses at the SAME rngs the scan uses
        # (computed BEFORE the step call — the train step donates params)
        rngs = jax.random.split(K(1), A)
        losses = [
            float(flow.loss(params, rngs[a], batch["token"][a], batch["token_len"][a],
                            batch["feat"][a], batch["feat_len"][a], batch["embedding"][a],
                            streaming=False))
            for a in range(A)
        ]
        step2 = make_flow_train_step(flow, opt, accum_steps=A)
        p2, _, m2 = step2(params, opt.init(params), batch, K(1), False)
        assert np.isfinite(float(m2["loss"]))
        np.testing.assert_allclose(float(m2["loss"]), np.mean(losses), rtol=1e-4)


class TestLossReferenceGolden:
    def test_label_smoothing_ce_matches_reference(self):
        """lm_ce_loss vs the reference LabelSmoothingLoss (KL against the
        smoothed distribution, per-token normalization, ignore padding),
        at smoothing 0 (shipped configs) and a nonzero knob."""
        import sys

        import pytest as _pytest

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            import torch
            from cosyvoice.transformer.label_smoothing_loss import LabelSmoothingLoss
        except Exception:  # pragma: no cover
            _pytest.skip("reference/torch unavailable")
        from cosyvoice_tpu.train.losses import IGNORE_ID, lm_ce_loss

        rng = np.random.default_rng(3)
        B, T, V = 2, 12, 40
        logits = rng.standard_normal((B, T, V)).astype(np.float32)
        targets = rng.integers(0, V, (B, T)).astype(np.int64)
        targets[0, 9:] = IGNORE_ID
        targets[1, 5:] = IGNORE_ID

        for smoothing in (0.0, 0.1):
            ref_mod = LabelSmoothingLoss(V, padding_idx=IGNORE_ID, smoothing=smoothing,
                                         normalize_length=True)
            ref = float(ref_mod(torch.from_numpy(logits), torch.from_numpy(targets)))
            got, _acc = lm_ce_loss(jnp.asarray(logits), jnp.asarray(targets.astype(np.int32)),
                                   smoothing=smoothing)
            # the reference's KLDivLoss includes the smoothed target's
            # (negative) entropy — a per-token constant with zero gradient
            # that ours omits; identical at smoothing=0
            conf, sm = 1.0 - smoothing, smoothing / (V - 1)
            const = (conf * np.log(conf) if conf > 0 else 0.0) + (
                (V - 1) * sm * np.log(sm) if sm > 0 else 0.0
            )
            np.testing.assert_allclose(float(got) + const, ref, rtol=1e-5, atol=1e-5)
