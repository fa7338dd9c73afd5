import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from cosyvoice_tpu.ops import (
    stft,
    istft,
    hann_window,
    mel_filterbank_slaney,
    mel_spectrogram,
    whisper_log_mel,
    kaldi_fbank,
    make_pad_mask,
    subsequent_chunk_mask,
    add_optional_chunk_mask,
    mask_to_bias,
    nucleus_sampling,
    ras_sampling,
    interpolate_linear,
    interpolate_nearest,
    repeat_interleave_time,
    fade_in_out,
    hamming_window,
)


class TestSTFT:
    def test_stft_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 1024)).astype(np.float32)
        n_fft, hop = 16, 4
        win = hann_window(n_fft)
        ours = stft(jnp.asarray(x), n_fft, hop, win)
        theirs = torch.stft(
            torch.from_numpy(x), n_fft, hop, n_fft,
            window=torch.from_numpy(np.asarray(win)), return_complex=True,
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)

    def test_istft_matches_torch(self):
        rng = np.random.default_rng(1)
        n_fft, hop, T = 16, 4, 64
        win_np = np.asarray(hann_window(n_fft))
        spec = (rng.standard_normal((1, n_fft // 2 + 1, T)) + 1j * rng.standard_normal((1, n_fft // 2 + 1, T))).astype(np.complex64)
        spec[:, 0] = np.real(spec[:, 0])
        spec[:, -1] = np.real(spec[:, -1])
        ours = istft(jnp.asarray(spec), n_fft, hop, jnp.asarray(win_np))
        theirs = torch.istft(torch.from_numpy(spec), n_fft, hop, n_fft, window=torch.from_numpy(win_np)).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-3)

    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((480 * 10,)).astype(np.float32)
        n_fft, hop = 16, 4
        win = hann_window(n_fft)
        y = istft(stft(jnp.asarray(x), n_fft, hop, win), n_fft, hop, win)
        np.testing.assert_allclose(np.asarray(y), x[: y.shape[-1]], atol=1e-4)


class TestMel:
    def test_slaney_filterbank_shape_and_coverage(self):
        fb = mel_filterbank_slaney(24000, 1920, 80, 0, 8000)
        assert fb.shape == (80, 961)
        # every mel band has nonzero weight; bands below fmax only
        assert (fb.sum(axis=1) > 0).all()
        freqs = np.linspace(0, 12000, 961)
        assert fb[:, freqs > 8100].sum() == 0

    def test_mel_spectrogram_shape(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 480 * 20)).astype(np.float32)) * 0.1
        m = mel_spectrogram(x)
        assert m.shape == (1, 80, 20)
        assert np.isfinite(np.asarray(m)).all()

    def test_whisper_mel_shape_and_range(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((16000,)).astype(np.float32)) * 0.1
        m = whisper_log_mel(x)
        assert m.shape == (128, 100)
        m = np.asarray(m)
        assert m.max() <= 3.0 and m.min() >= m.max() - 2.01  # (log range 8)/4

    def test_kaldi_fbank_shape(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((16000,)).astype(np.float32))
        f = kaldi_fbank(x, cmn=True)
        assert f.shape == (98, 80)  # snip_edges: 1+(16000-400)//160
        np.testing.assert_allclose(np.asarray(f).mean(axis=0), 0.0, atol=1e-4)


class TestMasks:
    def test_pad_mask(self):
        m = make_pad_mask(jnp.asarray([2, 4]), 5)
        assert np.asarray(m).tolist() == [[False, False, True, True, True], [False] * 4 + [True]]

    def test_chunk_mask(self):
        m = np.asarray(subsequent_chunk_mask(6, 2))
        # row 0-1 can see cols 0-1; rows 2-3 see 0-3 ...
        assert m[0].tolist() == [True, True, False, False, False, False]
        assert m[3].tolist() == [True, True, True, True, False, False]

    def test_add_optional_chunk_mask_full(self):
        pad = jnp.asarray([[[True, True, False]]])
        full = np.asarray(add_optional_chunk_mask(pad, 0))
        assert full.shape == (1, 3, 3)
        assert (full[0, :, 2] == False).all()  # noqa: E712

    def test_mask_to_bias(self):
        b = np.asarray(mask_to_bias(jnp.asarray([True, False])))
        assert b[0] == 0.0 and b[1] == -1.0e10


class TestSampling:
    def test_nucleus_respects_topk(self):
        logp = jnp.log(jnp.asarray([0.5, 0.3, 0.1, 0.05, 0.05]))
        ids = [int(nucleus_sampling(jax.random.PRNGKey(i), logp, top_p=0.8, top_k=2)) for i in range(50)]
        assert set(ids) <= {0, 1}

    def test_nucleus_includes_crossing_element(self):
        # p = [0.5, 0.4, 0.1]: cum before idx1 = 0.5 < 0.8 -> idx1 kept;
        # cum before idx2 = 0.9 >= 0.8 -> idx2 dropped.
        logp = jnp.log(jnp.asarray([0.5, 0.4, 0.1]))
        ids = {int(nucleus_sampling(jax.random.PRNGKey(i), logp, top_p=0.8, top_k=25)) for i in range(100)}
        assert ids == {0, 1}

    def test_ras_resamples_on_repetition(self):
        # token 0 dominates; it repeated >= 1 time in window -> must resample to != 0
        logp = jnp.log(jnp.asarray([0.97, 0.01, 0.01, 0.01]))
        # the decode ring shifts left / appends right: real tokens sit at the
        # RIGHT end when fewer than win_size have been decoded
        recent = jnp.full((10,), -1, jnp.int32).at[-1].set(0)
        tok = ras_sampling(jax.random.PRNGKey(0), logp, recent, jnp.asarray(1), top_p=0.8, top_k=25)
        assert int(tok) != 0

    def test_ras_no_repetition_keeps_candidate(self):
        logp = jnp.log(jnp.asarray([0.97, 0.01, 0.01, 0.01]))
        recent = jnp.full((10,), -1, jnp.int32)
        toks = {int(ras_sampling(jax.random.PRNGKey(i), logp, recent, jnp.asarray(0))) for i in range(20)}
        assert toks == {0}


class TestResample:
    def test_linear_matches_torch(self):
        x = np.random.default_rng(0).standard_normal((1, 3, 50)).astype(np.float32)
        ours = interpolate_linear(jnp.asarray(x), 123)
        theirs = torch.nn.functional.interpolate(torch.from_numpy(x), size=123, mode="linear").numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_nearest_matches_torch(self):
        x = np.random.default_rng(1).standard_normal((1, 2, 37)).astype(np.float32)
        ours = interpolate_nearest(jnp.asarray(x), 74)
        theirs = torch.nn.functional.interpolate(torch.from_numpy(x), size=74, mode="nearest").numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=0)

    def test_repeat_interleave(self):
        x = jnp.asarray([[1.0, 2.0]])
        np.testing.assert_array_equal(np.asarray(repeat_interleave_time(x, 3)), [[1, 1, 1, 2, 2, 2]])


class TestFade:
    def test_fade_matches_reference_formula(self):
        overlap = 8
        win = hamming_window(2 * overlap)
        new = jnp.ones((1, 20))
        old_tail = jnp.full((1, overlap), 2.0)
        out = np.asarray(fade_in_out(new, old_tail, win))
        w = np.hamming(2 * overlap)
        expected = 1.0 * w[:overlap] + 2.0 * w[overlap:]
        np.testing.assert_allclose(out[0, :overlap], expected, rtol=1e-6)
        np.testing.assert_allclose(out[0, overlap:], 1.0)


class TestSamplingReferenceGolden:
    def test_nucleus_support_matches_reference(self):
        """The set of samplable tokens after top-p/top-k truncation must
        equal the reference's stable-sorted inclusive-crossing loop
        (utils/common.py:147-162), across shaped and flat distributions."""
        import sys

        import pytest as _pytest

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            import torch
            from cosyvoice.utils.common import nucleus_sampling as ref_nucleus
        except Exception:  # pragma: no cover
            _pytest.skip("reference/torch unavailable")
        from cosyvoice_tpu.ops.sampling import nucleus_sampling

        rng = np.random.default_rng(7)
        for case in range(6):
            if case < 3:
                logits = rng.standard_normal(200).astype(np.float32) * (1 + 2 * case)
            else:
                # peaky: few tokens dominate (crossing element matters)
                logits = np.full(200, -10.0, np.float32)
                logits[rng.choice(200, 5, replace=False)] = [5, 4, 3, 2, 1]
            # reference support: sample many times from the torch loop
            t = torch.from_numpy(logits)
            ref_support = {int(ref_nucleus(t, top_p=0.8, top_k=25)) for _ in range(400)}
            logp = jnp.asarray(logits) - jax.nn.logsumexp(jnp.asarray(logits))
            got_support = {
                int(nucleus_sampling(jax.random.PRNGKey(i), logp)) for i in range(400)
            }
            # sampled-set equality is statistical; require mutual containment
            # of everything sampled plus exact agreement on the top candidate
            assert got_support <= (ref_support | _exact_ref_support(logits)), (case, got_support - ref_support)
            assert ref_support <= (got_support | _exact_got_support(logp)), (case, ref_support - got_support)


def _exact_ref_support(logits):
    """Closed-form reference truncation set (stable sort, cum<p inclusive,
    count<k) — mirrors utils/common.py:147-162 semantics exactly."""
    import torch

    t = torch.from_numpy(logits)
    sorted_value, sorted_idx = t.softmax(dim=0).sort(descending=True, stable=True)
    out, cum = set(), 0.0
    for i in range(len(sorted_idx)):
        if cum < 0.8 and len(out) < 25:
            cum += float(sorted_value[i])
            out.add(int(sorted_idx[i]))
        else:
            break
    return out


def _exact_got_support(logp):
    """Our samplable set by brute force over many RNG keys."""
    from cosyvoice_tpu.ops.sampling import nucleus_sampling

    return {int(nucleus_sampling(jax.random.PRNGKey(1000 + i), logp)) for i in range(400)}


class TestSamplingKnobs:
    """Serving sampling-convention knobs (reference Triton consumer:
    top_p 0.95 / top_k 50 / temperature 0.8 / repetition_penalty 1.1,
    runtime/triton_trtllm/model_repo/cosyvoice2/1/model.py:116-126)."""

    def test_repetition_penalty_formula(self):
        import jax.numpy as jnp

        from cosyvoice_tpu.ops.sampling import apply_repetition_penalty

        logits = jnp.asarray([2.0, -2.0, 1.0, -1.0])
        seen = jnp.asarray([True, True, False, False])
        out = np.asarray(apply_repetition_penalty(logits, seen, 1.25))
        # CTRL convention: positive seen logits divided, negative multiplied
        np.testing.assert_allclose(out, [2.0 / 1.25, -2.0 * 1.25, 1.0, -1.0], rtol=1e-6)

    def test_temperature_changes_decode_distribution(self):
        """A colder temperature concentrates the LM's sampled tokens; default
        temperature leaves the RAS stream bit-unchanged (parity guard)."""
        import dataclasses

        import jax

        from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
        from cosyvoice_tpu.models.qwen2 import Qwen2Config

        qwen = Qwen2Config(hidden_size=32, num_layers=1, num_heads=2, num_kv_heads=1,
                           head_dim=16, intermediate_size=64, vocab_size=64,
                           max_cache_len=128, dtype=jnp.float32)
        base_cfg = LMConfig(speech_token_size=24, block_size=24, top_p=1.0, top_k=24, qwen=qwen)
        lm = Qwen2LM(base_cfg)
        params = lm.init(jax.random.PRNGKey(0))
        ids = np.asarray([base_cfg.sos_id, 3, 5, base_cfg.task_id], np.int32)
        types = np.asarray([2, 0, 0, 2], np.int32)

        def stream(cfg, seed):
            m = Qwen2LM(cfg)
            toks = []
            for b in m.generate(params, ids, types, jax.random.PRNGKey(seed), 16, 16):
                toks.extend(b.tolist())
            return toks

        cold_cfg = dataclasses.replace(base_cfg, temperature=0.05)
        uniq_base = {len(set(stream(base_cfg, s))) for s in range(4)}
        uniq_cold = [len(set(stream(cold_cfg, s))) for s in range(4)]
        # near-zero temperature -> argmax-like decoding -> far fewer distinct ids
        assert np.mean(uniq_cold) < np.mean(list(uniq_base)), (uniq_cold, uniq_base)
        # identity knobs leave the stream unchanged
        same_cfg = dataclasses.replace(base_cfg, temperature=1.0, repetition_penalty=1.0)
        assert stream(base_cfg, 1) == stream(same_cfg, 1)

    def test_repetition_penalty_reduces_repeats(self):
        import dataclasses

        import jax

        from cosyvoice_tpu.models.llm import LMConfig, Qwen2LM
        from cosyvoice_tpu.models.qwen2 import Qwen2Config

        qwen = Qwen2Config(hidden_size=32, num_layers=1, num_heads=2, num_kv_heads=1,
                           head_dim=16, intermediate_size=64, vocab_size=64,
                           max_cache_len=128, dtype=jnp.float32)
        # near-greedy sampling so the unpenalized stream loops hard
        base_cfg = LMConfig(speech_token_size=24, block_size=24, top_p=1.0, top_k=24,
                            temperature=0.05, tau_r=2.0, qwen=qwen)
        lm = Qwen2LM(base_cfg)
        params = lm.init(jax.random.PRNGKey(0))
        ids = np.asarray([base_cfg.sos_id, 3, 5, base_cfg.task_id], np.int32)
        types = np.asarray([2, 0, 0, 2], np.int32)

        def max_run(cfg, seed):
            m = Qwen2LM(cfg)
            toks = []
            for b in m.generate(params, ids, types, jax.random.PRNGKey(seed), 20, 20):
                toks.extend(b.tolist())
            best = run = 1
            for a, b_ in zip(toks, toks[1:]):
                run = run + 1 if a == b_ else 1
                best = max(best, run)
            return best

        pen_cfg = dataclasses.replace(base_cfg, repetition_penalty=3.0)
        runs_base = [max_run(base_cfg, s) for s in range(3)]
        runs_pen = [max_run(pen_cfg, s) for s in range(3)]
        assert np.mean(runs_pen) < np.mean(runs_base), (runs_pen, runs_base)
