"""Checkpoint-conversion activation-match tests.

These build REAL torch reference modules (HF Qwen2; the reference repo's
HiFTGenerator / UpsampleConformerEncoder, imported read-only), convert their
state_dicts with cosyvoice_tpu.tools.convert_checkpoint, and require the JAX
forward to match torch outputs numerically — the strongest possible check
that a released CosyVoice checkpoint will behave identically here.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, "/root/reference")

# the reference import chain pulls in torchaudio (absent here) via
# utils/file_utils; a stub keeps the read-only modules importable
import importlib.machinery as _machinery
import types as _types

if "torchaudio" not in sys.modules:
    _ta = _types.ModuleType("torchaudio")
    _ta.load = None
    _ta.save = None
    _ta.__spec__ = _machinery.ModuleSpec("torchaudio", loader=None)
    _ta.__version__ = "0.0.0-stub"
    sys.modules["torchaudio"] = _ta
    for sub in ("torchaudio.compliance", "torchaudio.compliance.kaldi"):
        m = _types.ModuleType(sub)
        m.__spec__ = _machinery.ModuleSpec(sub, loader=None)
        sys.modules[sub] = m

if "omegaconf" not in sys.modules:
    _oc = _types.ModuleType("omegaconf")
    _oc.__spec__ = _machinery.ModuleSpec("omegaconf", loader=None)
    _oc.DictConfig = dict
    sys.modules["omegaconf"] = _oc

if "onnxruntime" not in sys.modules:
    _ort = _types.ModuleType("onnxruntime")
    _ort.__spec__ = _machinery.ModuleSpec("onnxruntime", loader=None)
    _ort.InferenceSession = object
    _ort.SessionOptions = object
    sys.modules["onnxruntime"] = _ort

from cosyvoice_tpu.tools.convert_checkpoint import (
    _fold_weight_norm,
    convert_flow_v2,
    convert_hift,
    convert_llm_v2,
)

K = jax.random.PRNGKey


def sd_numpy(module, prefix=""):
    return _fold_weight_norm({prefix + k: v.detach().numpy() for k, v in module.state_dict().items()})


class TestLLMConversion:
    def test_qwen2_activation_match(self):
        from transformers import Qwen2Config as HFQwenConfig
        from transformers import Qwen2ForCausalLM

        from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM, TYPE_SPEECH
        from cosyvoice_tpu.models.qwen2 import Qwen2Config

        torch.manual_seed(0)
        hf = Qwen2ForCausalLM(
            HFQwenConfig(
                hidden_size=32, num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=64, vocab_size=100, max_position_embeddings=128,
                rope_theta=1e6, rms_norm_eps=1e-6, attention_dropout=0.0, tie_word_embeddings=False,
            )
        ).eval()

        sd = {f"llm.model.{k}": v.detach().numpy() for k, v in hf.state_dict().items()}
        sd["llm_embedding.weight"] = np.random.default_rng(0).standard_normal((2, 32)).astype(np.float32)
        sd["speech_embedding.weight"] = np.random.default_rng(1).standard_normal((23, 32)).astype(np.float32)
        sd["llm_decoder.weight"] = np.random.default_rng(2).standard_normal((23, 32)).astype(np.float32)
        sd["llm_decoder.bias"] = np.zeros(23, np.float32)

        lm = Qwen2LM(
            LMConfig(
                speech_token_size=20,
                qwen=Qwen2Config(
                    hidden_size=32, num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8,
                    intermediate_size=64, vocab_size=100, max_cache_len=128, dtype=jnp.float32,
                ),
            )
        )
        template = lm.init(K(0))
        params = convert_llm_v2(sd, template)

        ids = np.random.default_rng(3).integers(0, 20, (1, 12)).astype(np.int32)
        types = np.full((1, 12), TYPE_SPEECH, np.int32)
        ours = lm.module.apply(params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray([12]), method="forward_logits")

        with torch.no_grad():
            emb = torch.from_numpy(sd["speech_embedding.weight"])[torch.from_numpy(ids.astype(np.int64))]
            hidden = hf(inputs_embeds=emb, output_hidden_states=True).hidden_states[-1]
            theirs = hidden @ torch.from_numpy(sd["llm_decoder.weight"]).T + torch.from_numpy(sd["llm_decoder.bias"])
        np.testing.assert_allclose(np.asarray(ours[0]), theirs[0].numpy(), atol=2e-3)


class TestHiFTConversion:
    def test_hift_decode_activation_match(self):
        from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor
        from cosyvoice.hifigan.generator import HiFTGenerator as TorchHiFT

        from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator

        torch.manual_seed(0)
        t_model = TorchHiFT(
            in_channels=80, base_channels=32, nb_harmonics=8, sampling_rate=24000,
            upsample_rates=[8, 5, 3], upsample_kernel_sizes=[16, 11, 7],
            istft_params={"n_fft": 16, "hop_len": 4},
            resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
            source_resblock_kernel_sizes=[7, 7, 11],
            source_resblock_dilation_sizes=[[1], [1], [1]],
            f0_predictor=ConvRNNF0Predictor(in_channels=80, cond_channels=32),
        ).eval()

        cfg = HiFTConfig(
            base_channels=32, resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
            source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)),
        )
        j_model = HiFTGenerator(cfg)
        template = j_model.init(K(0), jnp.zeros((1, 8, 80)), K(1))
        params = convert_hift(sd_numpy(t_model), template)

        rng = np.random.default_rng(0)
        mel = rng.standard_normal((1, 12, 80)).astype(np.float32)
        s = (rng.standard_normal((1, 12 * 480)) * 0.1).astype(np.float32)

        with torch.no_grad():
            wav_t = t_model.decode(torch.from_numpy(mel.transpose(0, 2, 1)), torch.from_numpy(s[:, None, :]))
            f0_t = t_model.f0_predictor(torch.from_numpy(mel.transpose(0, 2, 1)))
        wav_j = j_model.apply(params, jnp.asarray(mel), jnp.asarray(s), method="decode")
        f0_j = j_model.apply(params, jnp.asarray(mel), method="predict_f0")
        np.testing.assert_allclose(np.asarray(f0_j), f0_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(wav_j), wav_t.numpy(), atol=1e-3)


class TestFlowEncoderConversion:
    def test_upsample_encoder_activation_match(self):
        from cosyvoice.transformer.upsample_encoder import UpsampleConformerEncoder as TorchEnc

        from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
        from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig

        torch.manual_seed(0)
        dim = 512  # reference PreLookaheadLayer hardcodes 512 channels
        t_enc = TorchEnc(
            input_size=dim, output_size=dim, attention_heads=4, linear_units=64, num_blocks=1,
            dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
            input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
            selfattention_layer_type="rel_selfattn", use_cnn_module=False, macaron_style=False,
            static_chunk_size=5,
        ).eval()
        t_embed = torch.nn.Embedding(50, dim)
        t_proj = torch.nn.Linear(dim, 80)
        t_spk = torch.nn.Linear(192, 80)

        flow = CausalFlow(
            FlowConfig(
                input_size=dim, vocab_size=50, chunk_size=5, attention_heads=4, linear_units=64,
                num_blocks=1, num_up_blocks=4,
                estimator=EstimatorConfig(channels=(16,), attention_head_dim=8, n_blocks=1,
                                          num_mid_blocks=1, num_heads=2),
                cfm=CFMConfig(n_timesteps=1),
            )
        )
        template = flow.init(K(0))

        sd = sd_numpy(t_enc, prefix="encoder.")
        sd["input_embedding.weight"] = t_embed.weight.detach().numpy()
        sd["encoder_proj.weight"] = t_proj.weight.detach().numpy()
        sd["encoder_proj.bias"] = t_proj.bias.detach().numpy()
        sd["spk_embed_affine_layer.weight"] = t_spk.weight.detach().numpy()
        sd["spk_embed_affine_layer.bias"] = t_spk.bias.detach().numpy()
        # estimator side: random reference-shaped tensors (not exercised here)
        enc_params = convert_flow_v2({**sd, **_fake_estimator_sd(template["estimator"])}, template)["encoder"]

        ids = np.random.default_rng(1).integers(0, 50, (1, 10)).astype(np.int64)
        with torch.no_grad():
            emb_t = t_embed(torch.from_numpy(ids))
            h_t, _ = t_enc(emb_t, torch.tensor([10]), streaming=False)
            mu_t = t_proj(h_t)
        mu_j, _ = flow.encoder.apply(enc_params, jnp.asarray(ids, jnp.int32), jnp.asarray([10]))
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-3)


def _fake_estimator_sd(est_template):
    """Reference-shaped random estimator tensors (inverse of the converter
    transforms) so convert_flow_v2's completeness asserts pass."""
    import jax as _jax

    sd = {}
    rng = np.random.default_rng(0)

    def inv_path(path_keys):
        return [getattr(k, "key", str(k)) for k in path_keys]

    for path, leaf in _jax.tree_util.tree_leaves_with_path(est_template):
        keys = inv_path(path)  # ['params', 'mid_resnet_0', 'block1', 'conv', 'conv', 'kernel']
        name = keys[-1]
        arr = rng.standard_normal(leaf.shape).astype(np.float32) * 0.02
        torch_key, val = _flax_to_torch_estimator(keys, arr)
        sd[torch_key] = val
    return sd


def _flax_to_torch_estimator(keys, arr):
    d = "decoder.estimator"
    name = keys[-1]
    mid = keys[1:-1]

    def seg(flax_seg):
        # down_resnet_0 -> down_blocks.0.0 ; down_tf_0_j -> down_blocks.0.1.j ;
        # down_post_0 -> down_blocks.0.2 ; mid_resnet_i -> mid_blocks.i.0 ...
        import re

        m = re.match(r"(down|mid|up)_resnet_(\d+)", flax_seg)
        if m:
            kind, i = m.groups()
            return f"{kind}_blocks.{i}.0" if kind == "mid" else f"{kind}_blocks.{i}.0"
        m = re.match(r"(down|mid|up)_tf_(\d+)_(\d+)", flax_seg)
        if m:
            kind, i, j = m.groups()
            return f"{kind}_blocks.{i}.1.{j}"
        m = re.match(r"(down|up)_post_(\d+)", flax_seg)
        if m:
            kind, i = m.groups()
            return f"{kind}_blocks.{i}.2"
        return flax_seg

    first = seg(mid[0])
    rest = mid[1:]
    if "tf" in mid[0]:
        sub = {
            ("norm1",): "norm1", ("norm3",): "norm3",
            ("attn1", "to_q"): "attn1.to_q", ("attn1", "to_k"): "attn1.to_k",
            ("attn1", "to_v"): "attn1.to_v", ("attn1", "to_out"): "attn1.to_out.0",
            ("ff_in",): "ff.net.0.proj", ("ff_out",): "ff.net.2",
        }[tuple(rest)]
        if name == "kernel":
            return f"{d}.{first}.{sub}.weight", np.ascontiguousarray(arr.T)
        if name == "scale":
            return f"{d}.{first}.{sub}.weight", arr
        return f"{d}.{first}.{sub}.{name}", arr
    if "resnet" in mid[0]:
        if rest[0] in ("block1", "block2"):
            if rest[1] == "conv":
                key = f"{d}.{first}.{rest[0]}.block.0"
                if name == "kernel":
                    return f"{key}.weight", np.ascontiguousarray(arr.transpose(2, 1, 0))
                return f"{key}.{name}", arr
            key = f"{d}.{first}.{rest[0]}.block.2"
            return (f"{key}.weight", arr) if name == "scale" else (f"{key}.{name}", arr)
        if rest[0] == "mlp":
            key = f"{d}.{first}.mlp.1"
            return (f"{key}.weight", np.ascontiguousarray(arr.T)) if name == "kernel" else (f"{key}.{name}", arr)
        key = f"{d}.{first}.res_conv"
        if name == "kernel":
            return f"{key}.weight", np.ascontiguousarray(arr.transpose(2, 1, 0))
        return f"{key}.{name}", arr
    if "post" in mid[0]:
        key = f"{d}.{first}"
        if name == "kernel":
            return f"{key}.weight", np.ascontiguousarray(arr.transpose(2, 1, 0))
        return f"{key}.{name}", arr
    if mid[0] == "time_mlp":
        key = f"{d}.time_mlp.{mid[1]}"
        return (f"{key}.weight", np.ascontiguousarray(arr.T)) if name == "kernel" else (f"{key}.{name}", arr)
    if mid[0] == "final_block":
        if mid[1] == "conv":
            key = f"{d}.final_block.block.0"
            if name == "kernel":
                return f"{key}.weight", np.ascontiguousarray(arr.transpose(2, 1, 0))
            return f"{key}.{name}", arr
        key = f"{d}.final_block.block.2"
        return (f"{key}.weight", arr) if name == "scale" else (f"{key}.{name}", arr)
    if mid[0] == "final_proj":
        if name == "kernel":
            return f"{d}.final_proj.weight", np.ascontiguousarray(arr.transpose(2, 1, 0))
        return f"{d}.final_proj.{name}", arr
    raise KeyError(keys)


class TestV3Conversion:
    def test_dit_flow_structural(self):
        """v3 flow converter: synthetic reference-shaped sd fills every leaf."""
        from cosyvoice_tpu.models.dit import DiTConfig
        from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig
        from cosyvoice_tpu.tools.convert_checkpoint import convert_flow_v3

        dim, depth, heads, hd = 32, 2, 2, 8
        flow = CausalFlow(
            FlowConfig(
                input_size=80, vocab_size=50, encoder_type="dit_prelookahead", estimator_type="dit",
                dit_lookahead_channels=24,
                dit=DiTConfig(dim=dim, depth=depth, heads=heads, dim_head=hd, ff_mult=2, freq_embed_dim=16),
                cfm=CFMConfig(n_timesteps=1),
            )
        )
        template = flow.init(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)

        def lin(out_d, in_d):
            return rng.standard_normal((out_d, in_d)).astype(np.float32) * 0.02

        def conv(out_c, in_c, k):
            return rng.standard_normal((out_c, in_c, k)).astype(np.float32) * 0.02

        inner = heads * hd
        sd = {
            "input_embedding.weight": rng.standard_normal((50, 80)).astype(np.float32),
            "spk_embed_affine_layer.weight": lin(80, 192), "spk_embed_affine_layer.bias": np.zeros(80, np.float32),
            "pre_lookahead_layer.conv1.weight": conv(24, 80, 4), "pre_lookahead_layer.conv1.bias": np.zeros(24, np.float32),
            "pre_lookahead_layer.conv2.weight": conv(80, 24, 3), "pre_lookahead_layer.conv2.bias": np.zeros(80, np.float32),
        }
        d = "decoder.estimator"
        sd[f"{d}.time_embed.time_mlp.0.weight"] = lin(dim, 16); sd[f"{d}.time_embed.time_mlp.0.bias"] = np.zeros(dim, np.float32)
        sd[f"{d}.time_embed.time_mlp.2.weight"] = lin(dim, dim); sd[f"{d}.time_embed.time_mlp.2.bias"] = np.zeros(dim, np.float32)
        sd[f"{d}.input_embed.proj.weight"] = lin(dim, 320); sd[f"{d}.input_embed.proj.bias"] = np.zeros(dim, np.float32)
        for c in ("conv1", "conv2"):
            sd[f"{d}.input_embed.conv_pos_embed.{c}.0.weight"] = rng.standard_normal((dim, dim // 16, 31)).astype(np.float32) * 0.02
            sd[f"{d}.input_embed.conv_pos_embed.{c}.0.bias"] = np.zeros(dim, np.float32)
        for i in range(depth):
            t = f"{d}.transformer_blocks.{i}"
            sd[f"{t}.attn_norm.linear.weight"] = lin(dim * 6, dim); sd[f"{t}.attn_norm.linear.bias"] = np.zeros(dim * 6, np.float32)
            for n in ("to_q", "to_k", "to_v"):
                sd[f"{t}.attn.{n}.weight"] = lin(inner, dim); sd[f"{t}.attn.{n}.bias"] = np.zeros(inner, np.float32)
            sd[f"{t}.attn.to_out.0.weight"] = lin(dim, inner); sd[f"{t}.attn.to_out.0.bias"] = np.zeros(dim, np.float32)
            sd[f"{t}.ff.ff.0.0.weight"] = lin(dim * 2, dim); sd[f"{t}.ff.ff.0.0.bias"] = np.zeros(dim * 2, np.float32)
            sd[f"{t}.ff.ff.2.weight"] = lin(dim, dim * 2); sd[f"{t}.ff.ff.2.bias"] = np.zeros(dim, np.float32)
        sd[f"{d}.norm_out.linear.weight"] = lin(dim * 2, dim); sd[f"{d}.norm_out.linear.bias"] = np.zeros(dim * 2, np.float32)
        sd[f"{d}.proj_out.weight"] = lin(80, dim); sd[f"{d}.proj_out.bias"] = np.zeros(80, np.float32)

        params = convert_flow_v3(sd, template)
        # converted params must actually run
        tok = jnp.asarray(np.random.default_rng(1).integers(0, 50, (1, 8)), jnp.int32)
        mel = flow.inference(params, tok, jnp.asarray([8]), jnp.zeros((1, 16, 80)),
                             jnp.asarray(np.random.default_rng(2).standard_normal((1, 192)), jnp.float32))
        assert np.isfinite(np.asarray(mel)).all()


class TestV1Conversion:
    def test_transformer_lm_activation_match(self):
        """v1 TransformerLM: reference prompt forward == our prepare() logits."""
        from cosyvoice.llm.llm import TransformerLM as TorchLM
        from cosyvoice.transformer.encoder import ConformerEncoder as TorchConf
        from cosyvoice.transformer.encoder import TransformerEncoder as TorchTrans

        from cosyvoice_tpu.models.llm_v1 import LMv1Config, TransformerLM
        from cosyvoice_tpu.tools.convert_checkpoint import convert_llm_v1

        torch.manual_seed(0)
        t_lm = TorchLM(
            text_encoder_input_size=16, llm_input_size=32, llm_output_size=32,
            text_token_size=50, speech_token_size=30,
            text_encoder=TorchConf(
                input_size=16, output_size=32, attention_heads=2, linear_units=48, num_blocks=1,
                dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
                selfattention_layer_type="rel_selfattn", use_cnn_module=False, macaron_style=False,
                static_chunk_size=1,
            ),
            llm=TorchTrans(
                input_size=32, output_size=32, attention_heads=2, linear_units=48, num_blocks=2,
                dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                input_layer="linear_legacy", pos_enc_layer_type="rel_pos_espnet",
                selfattention_layer_type="rel_selfattn", static_chunk_size=1,
            ),
            sampling=None,
        ).eval()

        j_lm = TransformerLM(
            LMv1Config(
                text_encoder_input_size=16, llm_input_size=32, llm_output_size=32,
                text_token_size=50, speech_token_size=30,
                te_heads=2, te_linear_units=48, te_blocks=1,
                lm_heads=2, lm_linear_units=48, lm_blocks=2, max_cache_len=256,
            )
        )
        template = j_lm.init(K(0))
        params = convert_llm_v1(sd_numpy(t_lm), template)

        rng = np.random.default_rng(0)
        text = rng.integers(0, 50, 6).astype(np.int64)
        speech = rng.integers(0, 30, 4).astype(np.int64)
        spk = rng.standard_normal((1, 192)).astype(np.float32)

        with torch.no_grad():
            text_emb = t_lm.text_embedding(torch.from_numpy(text)[None])
            h, _ = t_lm.encode(text_emb, torch.tensor([6]))
            emb_n = torch.nn.functional.normalize(torch.from_numpy(spk), dim=1)
            spk_emb = t_lm.spk_embed_affine_layer(emb_n)[:, None]
            sos = t_lm.llm_embedding.weight[0].reshape(1, 1, -1)
            task = t_lm.llm_embedding.weight[1].reshape(1, 1, -1)
            sp_emb = t_lm.speech_embedding(torch.from_numpy(speech)[None])
            lm_input = torch.cat([sos, spk_emb, h, task, sp_emb], dim=1)
            out, _ = t_lm.llm(lm_input, torch.tensor([lm_input.shape[1]]), decoding_chunk_size=1,
                              num_decoding_left_chunks=-1)
            ref_logits = t_lm.llm_decoder(out[:, -1])

        # ours: bucketed prepare
        tp = np.zeros((1, 32), np.int32); tp[0, :6] = text
        pp = np.zeros((1, 32), np.int32); pp[0, :4] = speech
        k, v = j_lm.init_cache(1)
        logits, _, _, total = j_lm._jit_prepare(
            params, jnp.asarray(tp), jnp.asarray([6]), jnp.asarray(spk), jnp.asarray(pp), jnp.asarray([4]), k, v
        )
        assert int(total[0]) == lm_input.shape[1]
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=3e-3)


class TestV1FlowConversion:
    def test_v1_flow_conversion_and_run(self):
        """v1 flow converter: real torch conformer encoder + regulator convs,
        synthetic reference-shaped non-causal estimator; converted params must
        fill completely, match the regulator numerically, and run."""
        from cosyvoice.transformer.encoder import ConformerEncoder as TorchConf

        from cosyvoice_tpu.models.flow_decoder import EstimatorConfig
        from cosyvoice_tpu.models.flow_matching import CFMConfig
        from cosyvoice_tpu.models.flow_v1 import FlowV1Config, MaskedDiffFlow
        from cosyvoice_tpu.tools.convert_checkpoint import convert_flow_v1

        torch.manual_seed(0)
        dim = 32
        t_enc = TorchConf(
            input_size=dim, output_size=dim, attention_heads=2, linear_units=48, num_blocks=1,
            dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
            input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
            selfattention_layer_type="rel_selfattn", use_cnn_module=False, macaron_style=False,
        ).eval()
        # regulator: [Conv,GN,Mish] x2 + Conv1x1 (length_regulator.py:29-42)
        t_reg = torch.nn.Sequential(
            torch.nn.Conv1d(80, 80, 3, 1, 1), torch.nn.GroupNorm(1, 80), torch.nn.Mish(),
            torch.nn.Conv1d(80, 80, 3, 1, 1), torch.nn.GroupNorm(1, 80), torch.nn.Mish(),
            torch.nn.Conv1d(80, 80, 1, 1),
        ).eval()

        flow = MaskedDiffFlow(
            FlowV1Config(
                input_size=dim, vocab_size=40, attention_heads=2, linear_units=48, num_blocks=1,
                regulator_ratios=(1, 1),
                estimator=EstimatorConfig(channels=(16, 16), attention_head_dim=8, n_blocks=1,
                                          num_mid_blocks=1, num_heads=2, causal=False),
                cfm=CFMConfig(n_timesteps=2),
            )
        )
        template = flow.init(K(0))

        sd = sd_numpy(t_enc, prefix="encoder.")
        sd.update(sd_numpy(t_reg, prefix="length_regulator.model."))
        rng = np.random.default_rng(0)
        sd["input_embedding.weight"] = rng.standard_normal((40, dim)).astype(np.float32)
        for name, (o, i) in (("spk_embed_affine_layer", (80, 192)), ("encoder_proj", (80, dim))):
            sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.02
            sd[f"{name}.bias"] = np.zeros(o, np.float32)
        sd.update(_fake_v1_estimator_sd(rng))

        params = convert_flow_v1(sd, template)

        # regulator activation match
        x = rng.standard_normal((1, 10, 80)).astype(np.float32)
        with torch.no_grad():
            ref = t_reg(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
        ours = flow.encoder.apply(
            params["encoder"], jnp.asarray(x),
            method=lambda m, xx: m.regulator(xx),
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)

        # end-to-end inference with converted params
        tok = jnp.asarray(rng.integers(0, 40, (1, 30)), jnp.int32)
        pf = jnp.asarray(rng.random((1, 7, 80)), jnp.float32)
        emb = jnp.asarray(rng.standard_normal((1, 192)), jnp.float32)
        mel, cache = flow.inference(params, K(1), tok, 4, pf, emb)
        assert np.isfinite(np.asarray(mel)).all()


def _fake_v1_estimator_sd(rng):
    """Reference-shaped tensors for a tiny non-causal ConditionalDecoder
    (channels (16,16), 1 tf block, 1 mid block)."""
    d = "decoder.estimator"
    sd = {}

    def lin(key, o, i):
        sd[f"{key}.weight"] = rng.standard_normal((o, i)).astype(np.float32) * 0.02
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def conv(key, o, i, k):
        sd[f"{key}.weight"] = rng.standard_normal((o, i, k)).astype(np.float32) * 0.02
        sd[f"{key}.bias"] = np.zeros(o, np.float32)

    def gn(key, c):
        sd[f"{key}.weight"] = np.ones(c, np.float32)
        sd[f"{key}.bias"] = np.zeros(c, np.float32)

    def block(key, i, o):
        conv(f"{key}.block.0", o, i, 3)
        gn(f"{key}.block.1", o)

    def resnet(key, i, o, tdim=64):
        block(f"{key}.block1", i, o)
        block(f"{key}.block2", o, o)
        lin(f"{key}.mlp.1", o, tdim)
        conv(f"{key}.res_conv", o, i, 1)

    def tblock(key, dim=16, inner=16):
        gn(f"{key}.norm1", dim)
        gn(f"{key}.norm3", dim)
        for n in ("to_q", "to_k", "to_v"):
            sd[f"{key}.attn1.{n}.weight"] = rng.standard_normal((inner, dim)).astype(np.float32) * 0.02
        lin(f"{key}.attn1.to_out.0", dim, inner)
        lin(f"{key}.ff.net.0.proj", dim * 4, dim)
        lin(f"{key}.ff.net.2", dim, dim * 4)

    lin(f"{d}.time_mlp.linear_1", 64, 320)
    lin(f"{d}.time_mlp.linear_2", 64, 64)
    resnet(f"{d}.down_blocks.0.0", 320, 16)
    tblock(f"{d}.down_blocks.0.1.0")
    conv(f"{d}.down_blocks.0.2.conv", 16, 16, 3)  # Downsample1D
    resnet(f"{d}.down_blocks.1.0", 16, 16)
    tblock(f"{d}.down_blocks.1.1.0")
    conv(f"{d}.down_blocks.1.2", 16, 16, 3)  # last level: plain conv
    resnet(f"{d}.mid_blocks.0.0", 16, 16)
    tblock(f"{d}.mid_blocks.0.1.0")
    resnet(f"{d}.up_blocks.0.0", 32, 16)
    tblock(f"{d}.up_blocks.0.1.0")
    # Upsample1D ConvTranspose [in, out, k]
    sd[f"{d}.up_blocks.0.2.conv.weight"] = rng.standard_normal((16, 16, 4)).astype(np.float32) * 0.02
    sd[f"{d}.up_blocks.0.2.conv.bias"] = np.zeros(16, np.float32)
    resnet(f"{d}.up_blocks.1.0", 32, 16)
    tblock(f"{d}.up_blocks.1.1.0")
    conv(f"{d}.up_blocks.1.2", 16, 16, 3)
    block(f"{d}.final_block", 16, 16)
    conv(f"{d}.final_proj", 80, 16, 1)
    return sd
