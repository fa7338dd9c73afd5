"""End-to-end converted-checkpoint golden test: token -> mel -> wav.

Builds the reference torch CosyVoice2 synthesis stack from /root/reference
(CausalMaskedDiffWithXvec with UpsampleConformerEncoder +
CausalConditionalCFM/CausalConditionalDecoder, and HiFTGenerator) at tiny
size, converts its random-init state_dict with
cosyvoice_tpu.tools.convert_checkpoint, and asserts the JAX stack produces
the SAME mel and the SAME waveform — upgrading the per-module activation
matches of test_convert.py into a whole-pipeline guarantee
(reference cli/model.py:292-326 token2wav).

Determinism plumbing (not weight plumbing):
- both CFMs read the same fixed noise buffer (the reference seeds its own
  torch buffer at init, flow_matching.py:199-200; we overwrite it with the
  repo's buffer so z matches bit-for-bit),
- the HiFT sine-source excitation is stochastic by design, so ONE source
  tensor (from the torch SineGen) is fed to both decode paths; the f0 that
  drives it is independently computed by both stacks and cross-checked.

The matcha leaf blocks come from tests/_matcha_stub.py (the submodule is
empty in this image); everything in cosyvoice/flow/*.py runs unmodified.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, "/root/reference")

from tests._matcha_stub import AttrDict, install

install()

from cosyvoice.flow.decoder import CausalConditionalDecoder  # noqa: E402
from cosyvoice.flow.flow import CausalMaskedDiffWithXvec  # noqa: E402
from cosyvoice.flow.flow_matching import CausalConditionalCFM  # noqa: E402
from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor  # noqa: E402
from cosyvoice.hifigan.generator import HiFTGenerator as TorchHiFT  # noqa: E402
from cosyvoice.transformer.upsample_encoder import UpsampleConformerEncoder  # noqa: E402

from cosyvoice_tpu.models.flow import CausalFlow, FlowConfig  # noqa: E402
from cosyvoice_tpu.models.flow_decoder import EstimatorConfig  # noqa: E402
from cosyvoice_tpu.models.flow_matching import CFMConfig, fixed_noise_buffer  # noqa: E402
from cosyvoice_tpu.models.hift import HiFTConfig, HiFTGenerator  # noqa: E402
from cosyvoice_tpu.tools.convert_checkpoint import _fold_weight_norm, convert_flow_v2, convert_hift  # noqa: E402

K = jax.random.PRNGKey

VOCAB = 50
CHUNK = 5  # tokens per streaming chunk; mel chunk = 2*CHUNK
DIM = 512  # reference PreLookaheadLayer hardcodes 512 channels


def _sd(module):
    return _fold_weight_norm({k: v.detach().numpy() for k, v in module.state_dict().items()})


def _build_torch_flow():
    torch.manual_seed(7)
    enc = UpsampleConformerEncoder(
        input_size=DIM, output_size=DIM, attention_heads=4, linear_units=64, num_blocks=1,
        dropout_rate=0.0, positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        normalize_before=True, input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn", use_cnn_module=False, macaron_style=False,
        static_chunk_size=CHUNK,
    )
    est = CausalConditionalDecoder(
        in_channels=320, out_channels=80, channels=[16], dropout=0.0, attention_head_dim=8,
        n_blocks=1, num_mid_blocks=1, num_heads=2, act_fn="gelu",
        static_chunk_size=CHUNK * 2, num_decoding_left_chunks=-1,
    )
    cfm = CausalConditionalCFM(
        in_channels=240,
        cfm_params=AttrDict(
            sigma_min=1e-6, solver="euler", t_scheduler="cosine",
            training_cfg_rate=0.2, inference_cfg_rate=0.7, reg_loss_type="l1",
        ),
        n_spks=1, spk_emb_dim=80, estimator=est,
    )
    flow = CausalMaskedDiffWithXvec(
        input_size=DIM, output_size=80, spk_embed_dim=192, vocab_size=VOCAB,
        input_frame_rate=25, token_mel_ratio=2, pre_lookahead_len=3,
        encoder=enc, decoder=cfm,
    ).eval()
    # shared z: the repo's seeded buffer, [T,80] -> torch [1,80,T]
    flow.decoder.rand_noise = torch.from_numpy(
        np.ascontiguousarray(fixed_noise_buffer().T[None])
    )
    return flow


def _build_jax_flow():
    return CausalFlow(
        FlowConfig(
            input_size=DIM, vocab_size=VOCAB, chunk_size=CHUNK, attention_heads=4,
            linear_units=64, num_blocks=1, num_up_blocks=4,
            estimator=EstimatorConfig(channels=(16,), attention_head_dim=8, n_blocks=1,
                                      num_mid_blocks=1, num_heads=2,
                                      static_chunk_size=CHUNK * 2),
            cfm=CFMConfig(n_timesteps=10),
        )
    )


def _build_torch_hift():
    torch.manual_seed(11)
    return TorchHiFT(
        in_channels=80, base_channels=32, nb_harmonics=8, sampling_rate=24000,
        upsample_rates=[8, 5, 3], upsample_kernel_sizes=[16, 11, 7],
        istft_params={"n_fft": 16, "hop_len": 4},
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1], [1], [1]],
        f0_predictor=ConvRNNF0Predictor(in_channels=80, cond_channels=32),
    ).eval()


@pytest.mark.slow
class TestE2EGolden:
    @pytest.fixture(scope="class")
    def stacks(self):
        flow_t = _build_torch_flow()
        flow_j = _build_jax_flow()
        flow_params = convert_flow_v2(_sd(flow_t), flow_j.init(K(0)))

        hift_t = _build_torch_hift()
        hift_j = HiFTGenerator(
            HiFTConfig(
                base_channels=32, resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
                source_resblock_kernel_sizes=(7, 7, 11), source_resblock_dilations=((1,), (1,), (1,)),
            )
        )
        hift_params = convert_hift(_sd(hift_t), hift_j.init(K(0), jnp.zeros((1, 8, 80)), K(1)))
        return flow_t, flow_j, flow_params, hift_t, hift_j, hift_params

    def test_token_to_mel_to_wav_offline(self, stacks):
        flow_t, flow_j, flow_params, hift_t, hift_j, hift_params = stacks
        rng = np.random.default_rng(0)
        n_prompt, n_gen = 5, 15
        prompt_tok = rng.integers(0, VOCAB, (1, n_prompt)).astype(np.int64)
        gen_tok = rng.integers(0, VOCAB, (1, n_gen)).astype(np.int64)
        prompt_feat = (rng.standard_normal((1, 2 * n_prompt, 80)) * 0.3).astype(np.float32)
        xvec = rng.standard_normal((1, 192)).astype(np.float32)

        # ---- reference: token -> mel (offline, finalize) ----
        with torch.no_grad():
            mel_t, _ = flow_t.inference(
                token=torch.from_numpy(gen_tok), token_len=torch.tensor([n_gen]),
                prompt_token=torch.from_numpy(prompt_tok), prompt_token_len=torch.tensor([n_prompt]),
                prompt_feat=torch.from_numpy(prompt_feat), prompt_feat_len=torch.tensor([2 * n_prompt]),
                embedding=torch.from_numpy(xvec), streaming=False, finalize=True,
            )
        mel_t = mel_t.numpy().transpose(0, 2, 1)  # [1, 2*n_gen, 80]
        assert mel_t.shape == (1, 2 * n_gen, 80)

        # ---- ours: same assembly the engine does ----
        L = n_prompt + n_gen
        token_full = jnp.asarray(np.concatenate([prompt_tok, gen_tok], axis=1), jnp.int32)
        conds = jnp.zeros((1, 2 * L, 80), jnp.float32).at[:, : 2 * n_prompt].set(prompt_feat)
        mel_full = flow_j.inference(
            flow_params, token_full, jnp.asarray([L]), conds, jnp.asarray(xvec), streaming=False
        )
        mel_j = np.asarray(mel_full)[:, 2 * n_prompt :]

        np.testing.assert_allclose(mel_j, mel_t, atol=5e-3)

        # ---- both: mel -> wav with a single shared stochastic source ----
        mel_torch = torch.from_numpy(mel_t.transpose(0, 2, 1))
        torch.manual_seed(3)  # sine-source phase/noise: stochastic by design, shared below
        with torch.no_grad():
            f0_t = hift_t.f0_predictor(mel_torch)
            s = hift_t.f0_upsamp(f0_t[:, None]).transpose(1, 2)  # [1, Twav, 1]
            s, _, _ = hift_t.m_source(s)
            s_t = s.transpose(1, 2)  # [1, 1, Twav]
            wav_t = hift_t.decode(mel_torch, s_t)
        f0_j = hift_j.apply(hift_params, jnp.asarray(mel_t), method="predict_f0")
        np.testing.assert_allclose(np.asarray(f0_j), f0_t.numpy(), atol=1e-4)

        s_np = s_t.numpy()[:, 0, :]
        wav_j = hift_j.apply(hift_params, jnp.asarray(mel_j), jnp.asarray(s_np), method="decode")
        np.testing.assert_allclose(np.asarray(wav_j), wav_t.numpy(), atol=5e-3)

    def test_token_to_mel_streaming_chunk(self, stacks):
        """Streaming=True chunk masks through both stacks (non-final chunk with
        lookahead context)."""
        flow_t, flow_j, flow_params, *_ = stacks
        rng = np.random.default_rng(1)
        n_prompt, n_body, n_ctx = 5, 2 * CHUNK, 3
        prompt_tok = rng.integers(0, VOCAB, (1, n_prompt)).astype(np.int64)
        body_tok = rng.integers(0, VOCAB, (1, n_body + n_ctx)).astype(np.int64)
        prompt_feat = (rng.standard_normal((1, 2 * n_prompt, 80)) * 0.3).astype(np.float32)
        xvec = rng.standard_normal((1, 192)).astype(np.float32)

        with torch.no_grad():
            mel_t, _ = flow_t.inference(
                token=torch.from_numpy(body_tok), token_len=torch.tensor([n_body + n_ctx]),
                prompt_token=torch.from_numpy(prompt_tok), prompt_token_len=torch.tensor([n_prompt]),
                prompt_feat=torch.from_numpy(prompt_feat), prompt_feat_len=torch.tensor([2 * n_prompt]),
                embedding=torch.from_numpy(xvec), streaming=True, finalize=False,
            )
        mel_t = mel_t.numpy().transpose(0, 2, 1)  # [1, 2*(n_prompt+n_body) - 2*n_prompt, 80]

        # token array needs >= lookahead slack beyond the body (the encoder
        # scatters the context embeddings at token_len, see engine._flow_chunk)
        L = n_prompt + n_body
        tok = np.zeros((1, L + n_ctx), np.int32)
        tok[:, :L] = np.concatenate([prompt_tok, body_tok[:, :n_body]], axis=1)
        ctx = jnp.asarray(body_tok[:, n_body:], jnp.int32)
        conds = jnp.zeros((1, 2 * (L + n_ctx), 80), jnp.float32).at[:, : 2 * n_prompt].set(prompt_feat)
        mel_full = flow_j.inference(
            flow_params, jnp.asarray(tok), jnp.asarray([L]), conds, jnp.asarray(xvec),
            context_token=ctx, streaming=True,
        )
        mel_j = np.asarray(mel_full)[:, 2 * n_prompt : 2 * L]
        np.testing.assert_allclose(mel_j, mel_t, atol=5e-3)
