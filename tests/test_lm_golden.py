"""LM-inclusive golden chain: reference Qwen2LM.inference vs our generate.

Builds the reference's own torch Qwen2LM (cosyvoice/llm/llm.py:257-502) around
a tiny HF Qwen2, converts its state_dict with convert_llm_v2, and asserts our
Qwen2LM.generate emits the IDENTICAL token stream — including stop-id
handling, min/max-token-text-ratio bounds and the [sos][text][task][prompt
speech] embedding assembly (llm.py:474-494). Sampling is made deterministic
on BOTH sides by the same rule (top_k=1 greedy nucleus, repetition-resample
disabled via tau_r) so the comparison isolates weights + decode semantics
from RNG implementation differences; distributional parity of the RAS
sampler itself is covered by test_ops.TestSamplingReferenceGolden.

A second test chains the LM tokens into the flow+HiFT golden stacks of
test_e2e_golden, closing the full text-side -> wav system guarantee.

The v2 stop semantics are exact: before min_len ONLY eos is suppressed
(reference llm.py:157-158) and the other stop ids terminate generation even
pre-min_len (llm.py:544-545) — one fixture here stops early on stop-id 51 at
step 9 < min_len 12, exercising precisely that path. (v3's layout keeps the
broader special-range mask; see models/llm.py decode-block comments.)
"""

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, "/root/reference")

# reference import chain needs these absent packages stubbed (same pattern as
# test_convert.py)
import importlib.machinery as _machinery
import types as _types

for _name, _attrs in (
    ("torchaudio", {"load": None, "save": None, "__version__": "0.0.0-stub"}),
    ("torchaudio.compliance", {}),
    ("torchaudio.compliance.kaldi", {}),
    ("omegaconf", {"DictConfig": dict}),
    ("onnxruntime", {"InferenceSession": object, "SessionOptions": object}),
):
    if _name not in sys.modules:
        _m = _types.ModuleType(_name)
        _m.__spec__ = _machinery.ModuleSpec(_name, loader=None)
        for _k, _v in _attrs.items():
            setattr(_m, _k, _v)
        sys.modules[_name] = _m

from cosyvoice.llm.llm import Qwen2Encoder, Qwen2LM as RefQwen2LM  # noqa: E402
from cosyvoice.utils.common import ras_sampling as ref_ras_sampling  # noqa: E402

from cosyvoice_tpu.models.llm import (  # noqa: E402
    LMConfig,
    Qwen2LM,
    TYPE_SPECIAL,
    TYPE_SPEECH,
    TYPE_TEXT,
)
from cosyvoice_tpu.models.qwen2 import Qwen2Config  # noqa: E402
from cosyvoice_tpu.tools.convert_checkpoint import convert_llm_v2  # noqa: E402

K = jax.random.PRNGKey

SPEECH_VOCAB = 50  # == test_e2e_golden.VOCAB so the chain test can reuse its flow
TEXT_VOCAB = 100
HIDDEN = 32


@pytest.fixture(scope="module")
def lms(tmp_path_factory):
    from transformers import Qwen2Config as HFQwenConfig
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(20)
    hf = Qwen2ForCausalLM(
        HFQwenConfig(
            hidden_size=HIDDEN, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=64, vocab_size=TEXT_VOCAB,
            max_position_embeddings=512, rope_theta=1e6, rms_norm_eps=1e-6,
            attention_dropout=0.0, tie_word_embeddings=False,
        )
    ).eval()
    pretrain = tmp_path_factory.mktemp("qwen") / "tiny"
    hf.save_pretrained(pretrain)

    # deterministic sampling shared by both stacks: top_k=1 makes the nucleus
    # keep exactly the argmax; tau_r high disables the repetition resample
    ref = RefQwen2LM(
        llm_input_size=HIDDEN, llm_output_size=HIDDEN, speech_token_size=SPEECH_VOCAB,
        llm=Qwen2Encoder(str(pretrain)),
        sampling=partial(ref_ras_sampling, top_p=0.8, top_k=1, tau_r=100.0),
    ).eval()

    ours = Qwen2LM(
        LMConfig(
            speech_token_size=SPEECH_VOCAB, llm_input_size=HIDDEN,
            top_p=0.8, top_k=1, tau_r=100.0, block_size=8,
            qwen=Qwen2Config(
                hidden_size=HIDDEN, num_layers=2, num_heads=4, num_kv_heads=2,
                head_dim=8, intermediate_size=64, vocab_size=TEXT_VOCAB,
                max_cache_len=512, dtype=jnp.float32,
            ),
        )
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_llm_v2(sd, ours.init(K(0)))
    return ref, ours, params


def _ref_tokens(ref, prompt_text, text, prompt_speech):
    with torch.no_grad():
        out = list(
            ref.inference(
                text=torch.from_numpy(text), text_len=torch.tensor([text.shape[1]]),
                prompt_text=torch.from_numpy(prompt_text),
                prompt_text_len=torch.tensor([prompt_text.shape[1]]),
                prompt_speech_token=torch.from_numpy(prompt_speech),
                prompt_speech_token_len=torch.tensor([prompt_speech.shape[1]]),
                embedding=torch.zeros(0),
            )
        )
    return [int(t) for t in out]


def _our_tokens(ours, params, prompt_text, text, prompt_speech):
    c = ours.cfg
    full_text = np.concatenate([prompt_text, text], axis=1)[0]
    psp = prompt_speech[0]
    ids = np.concatenate([[c.sos_id], full_text, [c.task_id], psp]).astype(np.int32)
    types = np.concatenate(
        [[TYPE_SPECIAL], np.full(len(full_text), TYPE_TEXT), [TYPE_SPECIAL],
         np.full(len(psp), TYPE_SPEECH)]
    ).astype(np.int32)
    n_text = text.shape[1]
    blocks = list(
        ours.generate(params, ids, types, K(5), min_len=2 * n_text, max_len=20 * n_text)
    )
    return np.concatenate(blocks).tolist() if blocks else []


class TestLMGolden:
    def test_token_stream_identical(self, lms):
        ref, ours, params = lms
        rng = np.random.default_rng(42)
        prompt_text = rng.integers(0, TEXT_VOCAB, (1, 4)).astype(np.int64)
        text = rng.integers(0, TEXT_VOCAB, (1, 6)).astype(np.int64)
        prompt_speech = rng.integers(0, SPEECH_VOCAB, (1, 8)).astype(np.int64)

        got_ref = _ref_tokens(ref, prompt_text, text, prompt_speech)
        got_ours = _our_tokens(ours, params, prompt_text, text, prompt_speech)

        assert got_ours == got_ref
        # the run must be meaningful: several tokens, all in the speech vocab,
        # and bounded by the reference's min/max token-text ratios
        assert 2 * 6 <= len(got_ref) <= 20 * 6 or (
            len(got_ref) < 2 * 6 and got_ref  # natural stop on non-eos stop id
        )
        assert all(0 <= t < SPEECH_VOCAB for t in got_ref)

    def test_token_stream_identical_more_seeds(self, lms):
        """Multiple deterministic inputs: different lengths and prompt mixes."""
        ref, ours, params = lms
        for seed, n_pt, n_t, n_ps in [(1, 2, 3, 5), (7, 6, 9, 12), (13, 1, 1, 0)]:
            rng = np.random.default_rng(seed)
            prompt_text = rng.integers(0, TEXT_VOCAB, (1, n_pt)).astype(np.int64)
            text = rng.integers(0, TEXT_VOCAB, (1, n_t)).astype(np.int64)
            prompt_speech = rng.integers(0, SPEECH_VOCAB, (1, n_ps)).astype(np.int64)
            got_ref = _ref_tokens(ref, prompt_text, text, prompt_speech)
            got_ours = _our_tokens(ours, params, prompt_text, text, prompt_speech)
            assert got_ours == got_ref, (seed, got_ours, got_ref)

    def test_max_len_bound_respected(self, lms):
        """When nothing stops naturally the stream must cut at max_len on both
        sides (reference: for i in range(max_len), llm.py:536-549)."""
        ref, ours, params = lms
        rng = np.random.default_rng(3)
        prompt_text = rng.integers(0, TEXT_VOCAB, (1, 2)).astype(np.int64)
        text = rng.integers(0, TEXT_VOCAB, (1, 2)).astype(np.int64)
        prompt_speech = rng.integers(0, SPEECH_VOCAB, (1, 4)).astype(np.int64)
        got_ref = _ref_tokens(ref, prompt_text, text, prompt_speech)
        got_ours = _our_tokens(ours, params, prompt_text, text, prompt_speech)
        assert got_ours == got_ref
        assert len(got_ref) <= 20 * 2


class TestFullSystemGolden:
    @pytest.mark.slow
    def test_text_to_wav_via_lm_flow_hift(self, lms):
        """Full system: LM tokens (identical by the test above) -> flow mel ->
        HiFT wav, reference torch classes vs converted JAX stacks."""
        from tests.test_e2e_golden import (
            HiFTConfig,
            HiFTGenerator,
            _build_jax_flow,
            _build_torch_flow,
            _build_torch_hift,
            _sd,
            convert_flow_v2,
            convert_hift,
        )

        ref, ours, params = lms
        rng = np.random.default_rng(42)
        prompt_text = rng.integers(0, TEXT_VOCAB, (1, 4)).astype(np.int64)
        text = rng.integers(0, TEXT_VOCAB, (1, 6)).astype(np.int64)
        prompt_speech = rng.integers(0, SPEECH_VOCAB, (1, 8)).astype(np.int64)
        toks_ref = _ref_tokens(ref, prompt_text, text, prompt_speech)
        toks_ours = _our_tokens(ours, params, prompt_text, text, prompt_speech)
        assert toks_ours == toks_ref and len(toks_ref) >= 2

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

        n_prompt, n_gen = prompt_speech.shape[1], len(toks_ref)
        gen_tok = np.asarray([toks_ref], np.int64)
        prompt_feat = (rng.standard_normal((1, 2 * n_prompt, 80)) * 0.3).astype(np.float32)
        xvec = rng.standard_normal((1, 192)).astype(np.float32)

        with torch.no_grad():
            mel_t, _ = flow_t.inference(
                token=torch.from_numpy(gen_tok), token_len=torch.tensor([n_gen]),
                prompt_token=torch.from_numpy(prompt_speech),
                prompt_token_len=torch.tensor([n_prompt]),
                prompt_feat=torch.from_numpy(prompt_feat),
                prompt_feat_len=torch.tensor([2 * n_prompt]),
                embedding=torch.from_numpy(xvec), streaming=False, finalize=True,
            )
        mel_t = mel_t.numpy().transpose(0, 2, 1)

        L = n_prompt + n_gen
        token_full = jnp.asarray(np.concatenate([prompt_speech, gen_tok], axis=1), jnp.int32)
        conds = jnp.zeros((1, 2 * L, 80), jnp.float32).at[:, : 2 * n_prompt].set(prompt_feat)
        mel_j = np.asarray(
            flow_j.inference(
                flow_params, token_full, jnp.asarray([L]), conds, jnp.asarray(xvec), streaming=False
            )
        )[:, 2 * n_prompt :]
        np.testing.assert_allclose(mel_j, mel_t, atol=5e-3)

        mel_torch = torch.from_numpy(mel_t.transpose(0, 2, 1))
        torch.manual_seed(3)
        with torch.no_grad():
            f0_t = hift_t.f0_predictor(mel_torch)
            s = hift_t.f0_upsamp(f0_t[:, None]).transpose(1, 2)
            s, _, _ = hift_t.m_source(s)
            s_t = s.transpose(1, 2)
            wav_t = hift_t.decode(mel_torch, s_t)
        wav_j = hift_j.apply(
            hift_params, jnp.asarray(mel_j), jnp.asarray(s_t.numpy()[:, 0, :]), method="decode"
        )
        np.testing.assert_allclose(np.asarray(wav_j), wav_t.numpy(), atol=5e-3)
