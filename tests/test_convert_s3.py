"""S3 speech-tokenizer conversion: activation-match a torch whisper-style
encoder mirror (the module layout the reference's speech_tokenizer_v*.onnx
graphs are exported from) against our JAX S3Tokenizer."""

import numpy as np
import torch

from cosyvoice_tpu.models.speech_tokenizer import S3Tokenizer, S3TokenizerConfig, sinusoids
from cosyvoice_tpu.tools.convert_checkpoint import convert_s3_tokenizer, s3_config_from_weights

import jax
import jax.numpy as jnp


class _TorchBlock(torch.nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.attn_ln = torch.nn.LayerNorm(d)
        self.attn = torch.nn.Module()
        self.attn.query = torch.nn.Linear(d, d)
        self.attn.key = torch.nn.Linear(d, d, bias=False)
        self.attn.value = torch.nn.Linear(d, d)
        self.attn.out = torch.nn.Linear(d, d)
        self.mlp_ln = torch.nn.LayerNorm(d)
        self.mlp = torch.nn.Sequential(torch.nn.Linear(d, 4 * d), torch.nn.GELU(), torch.nn.Linear(4 * d, d))

    def forward(self, x):
        hh = self.attn_ln(x)
        B, T, C = hh.shape
        hd = C // self.h
        q = self.attn.query(hh).view(B, T, self.h, hd)
        k = self.attn.key(hh).view(B, T, self.h, hd)
        v = self.attn.value(hh).view(B, T, self.h, hd)
        s = torch.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
        a = torch.softmax(s, dim=-1)
        o = torch.einsum("bhts,bshd->bthd", a, v).reshape(B, T, C)
        x = x + self.attn.out(o)
        return x + self.mlp(self.mlp_ln(x))


class _TorchS3(torch.nn.Module):
    """Whisper-style encoder + stride-2 downsample + FSQ (v2/v3 layout)."""

    def __init__(self, n_mels=16, d=32, h=4, n_blocks=2, n_levels=8):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(n_mels, d, 3, padding=1)
        self.conv2 = torch.nn.Conv1d(d, d, 3, stride=2, padding=1)
        self.blocks = torch.nn.ModuleList([_TorchBlock(d, h) for _ in range(n_blocks)])
        self.ln_post = torch.nn.LayerNorm(d)
        self.conv3 = torch.nn.Conv1d(d, d, 3, stride=2, padding=1)
        self.quantizer = torch.nn.Module()
        self.quantizer.project_in = torch.nn.Linear(d, n_levels)

    def forward(self, mel):  # mel [B, T, n_mels]
        x = torch.nn.functional.gelu(self.conv1(mel.permute(0, 2, 1)))
        x = torch.nn.functional.gelu(self.conv2(x)).permute(0, 2, 1)
        x = x + torch.from_numpy(sinusoids(x.shape[1], x.shape[2]))
        for b in self.blocks:
            x = b(x)
        x = self.ln_post(x)
        x = torch.nn.functional.gelu(self.conv3(x.permute(0, 2, 1))).permute(0, 2, 1)
        proj = self.quantizer.project_in(x)
        q = torch.round(torch.tanh(proj) + 1.0)  # levels=3: half=1
        strides = torch.from_numpy(np.cumprod([1] + [3] * (proj.shape[-1] - 1)).astype(np.float32))
        return torch.sum(q * strides, dim=-1).to(torch.int32), proj


class TestS3Conversion:
    def test_activation_match_fsq(self):
        torch.manual_seed(0)
        tm = _TorchS3().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        cfg = S3TokenizerConfig(n_mels=16, d_model=32, num_heads=4, num_layers=2,
                                use_fsq=True, fsq_levels=(3,) * 8, token_rate_div=2)
        s3 = S3Tokenizer(cfg)
        mel = np.random.default_rng(0).standard_normal((1, 24, 16)).astype(np.float32)
        template = s3.init(jax.random.PRNGKey(0), jnp.asarray(mel), jnp.asarray([24]))
        params = convert_s3_tokenizer(sd, template)

        with torch.no_grad():
            ref_tokens, ref_proj = tm(torch.from_numpy(mel))
        tokens, tok_len = s3.apply(params, jnp.asarray(mel), jnp.asarray([24]))
        assert int(tok_len[0]) == 6  # 24 mel -> 12 (conv2) -> 6 (conv3)
        np.testing.assert_array_equal(np.asarray(tokens)[0], ref_tokens.numpy()[0])

    def test_prefix_normalization(self):
        """onnx exports often prefix names with 'encoder.' — same result."""
        torch.manual_seed(0)
        tm = _TorchS3().eval()
        sd = {f"encoder.{k}": v.detach().numpy() for k, v in tm.state_dict().items()}
        cfg = S3TokenizerConfig(n_mels=16, d_model=32, num_heads=4, num_layers=2,
                                use_fsq=True, fsq_levels=(3,) * 8, token_rate_div=2)
        s3 = S3Tokenizer(cfg)
        mel = np.zeros((1, 8, 16), np.float32)
        template = s3.init(jax.random.PRNGKey(0), jnp.asarray(mel), jnp.asarray([8]))
        params = convert_s3_tokenizer(sd, template)
        leaves = jax.tree_util.tree_leaves(params)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

    def test_prefix_collision_raises(self):
        """Two distinct checkpoint keys normalizing to one name with
        DIFFERENT values must fail loudly, not silently keep the last."""
        import pytest as _pytest

        sd = {
            "conv1.weight": np.ones((4, 4), np.float32),
            "model.conv1.weight": np.zeros((4, 4), np.float32),
        }
        with _pytest.raises(ValueError, match="collision"):
            convert_s3_tokenizer(sd, template={})

    def test_prefix_duplicate_identical_ok(self):
        """Identical duplicates (wrapper + submodule dumps of the SAME
        tensor) normalize without error — only differing values collide."""
        w = np.ones((4, 4, 3), np.float32)
        sd = {"conv1.weight": w, "model.conv1.weight": w.copy()}
        try:
            convert_s3_tokenizer(sd, template={})
        except ValueError as e:  # pragma: no cover
            raise AssertionError(f"identical duplicates must not collide: {e}")
        except AssertionError:
            # TreeFiller's unfilled-leaves assert on the empty template is
            # expected — normalization itself passed
            pass


class _TorchS3V1(torch.nn.Module):
    """v1 layout: whisper encoder at 50 Hz (no second downsample) + euclidean
    VQ codebook (speech_tokenizer_v1.onnx role)."""

    def __init__(self, n_mels=16, d=32, h=4, n_blocks=2, vocab=64):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(n_mels, d, 3, padding=1)
        self.conv2 = torch.nn.Conv1d(d, d, 3, stride=2, padding=1)
        self.blocks = torch.nn.ModuleList([_TorchBlock(d, h) for _ in range(n_blocks)])
        self.ln_post = torch.nn.LayerNorm(d)
        self.quantizer = torch.nn.Module()
        self.quantizer._codebook = torch.nn.Module()
        self.quantizer._codebook.embed = torch.nn.Parameter(torch.randn(vocab, d))

    def forward(self, mel):
        x = torch.nn.functional.gelu(self.conv1(mel.permute(0, 2, 1)))
        x = torch.nn.functional.gelu(self.conv2(x)).permute(0, 2, 1)
        x = x + torch.from_numpy(sinusoids(x.shape[1], x.shape[2]))
        for b in self.blocks:
            x = b(x)
        x = self.ln_post(x)
        cb = self.quantizer._codebook.embed
        d2 = (x * x).sum(-1, keepdim=True) - 2 * x @ cb.T + (cb * cb).sum(-1)[None, None]
        return d2.argmin(-1).to(torch.int32)


class TestS3V1Conversion:
    def test_activation_match_vq(self):
        torch.manual_seed(1)
        tm = _TorchS3V1().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        cfg = S3TokenizerConfig(n_mels=16, d_model=32, num_heads=4, num_layers=2,
                                use_fsq=False, codebook_size=64, token_rate_div=1)
        s3 = S3Tokenizer(cfg)
        rng = np.random.default_rng(2)
        mel = rng.standard_normal((1, 24, 16)).astype(np.float32)
        template = s3.init(jax.random.PRNGKey(0), jnp.asarray(mel), jnp.asarray([24]))
        params = convert_s3_tokenizer(sd, template)
        with torch.no_grad():
            ref_tokens = tm(torch.from_numpy(mel))
        tokens, tok_len = s3.apply(params, jnp.asarray(mel), jnp.asarray([24]))
        assert int(tok_len[0]) == 12  # 24 mel -> 12 (conv2 only; 50 Hz)
        np.testing.assert_array_equal(np.asarray(tokens)[0, :12], ref_tokens.numpy()[0, :12])


def _full_size_v2_graph():
    """Initializer dict at the REAL speech_tokenizer_v2 scale (whisper-large
    width d=1280 / 128 mels / 6 layers / FSQ-8 / 25 Hz downsample) with the
    whisper export names — shapes only, values random. Conversion must
    consume every tensor and fill every leaf at this scale."""
    rng = np.random.default_rng(0)
    d, mels, layers, levels = 1280, 128, 6, 8

    def t(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {
        "encoder.conv1.weight": t(d, mels, 3), "encoder.conv1.bias": t(d),
        "encoder.conv2.weight": t(d, d, 3), "encoder.conv2.bias": t(d),
        "encoder.positional_embedding": t(1500, d),  # recomputed, not loaded
        "encoder.ln_post.weight": t(d), "encoder.ln_post.bias": t(d),
        "encoder.conv3.weight": t(d, d, 3), "encoder.conv3.bias": t(d),
        "quantizer.project_in.weight": t(levels, d), "quantizer.project_in.bias": t(levels),
    }
    for i in range(layers):
        p = f"encoder.blocks.{i}"
        sd.update({
            f"{p}.attn_ln.weight": t(d), f"{p}.attn_ln.bias": t(d),
            f"{p}.attn.query.weight": t(d, d), f"{p}.attn.query.bias": t(d),
            f"{p}.attn.key.weight": t(d, d),
            f"{p}.attn.value.weight": t(d, d), f"{p}.attn.value.bias": t(d),
            f"{p}.attn.out.weight": t(d, d), f"{p}.attn.out.bias": t(d),
            f"{p}.mlp_ln.weight": t(d), f"{p}.mlp_ln.bias": t(d),
            f"{p}.mlp.0.weight": t(4 * d, d), f"{p}.mlp.0.bias": t(4 * d),
            f"{p}.mlp.2.weight": t(d, 4 * d), f"{p}.mlp.2.bias": t(d),
        })
    return sd


class TestS3ConfigFromGraph:
    def test_v2_full_scale(self):
        """Config is derived from the graph, and conversion consumes every
        tensor at the released checkpoint's scale."""
        sd = _full_size_v2_graph()
        cfg = s3_config_from_weights(sd)
        assert (cfg.n_mels, cfg.d_model, cfg.num_heads, cfg.num_layers) == (128, 1280, 20, 6)
        assert cfg.use_fsq and cfg.fsq_levels == (3,) * 8 and cfg.codebook_size == 6561
        assert cfg.token_rate_div == 2

        s3 = S3Tokenizer(cfg)
        template = jax.eval_shape(
            lambda: s3.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.n_mels)), jnp.asarray([8]))
        )
        params = convert_s3_tokenizer(sd, template)
        n_leaves = len(jax.tree_util.tree_leaves(params))
        assert n_leaves == len(jax.tree_util.tree_leaves(template))

    def test_v1_vq_config(self):
        torch.manual_seed(1)
        tm = _TorchS3V1().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        cfg = s3_config_from_weights(sd)
        assert not cfg.use_fsq and cfg.codebook_size == 64
        assert cfg.token_rate_div == 1  # v1 stays at 50 Hz
        assert (cfg.n_mels, cfg.d_model, cfg.num_layers) == (16, 32, 2)

    def test_strict_rejects_unmodeled_tensors(self):
        """A graph with a submodule we don't model must fail loudly."""
        import pytest as _pytest

        torch.manual_seed(0)
        tm = _TorchS3().eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        sd["mystery_adapter.weight"] = np.zeros((32, 32), np.float32)
        cfg = S3TokenizerConfig(n_mels=16, d_model=32, num_heads=4, num_layers=2,
                                use_fsq=True, fsq_levels=(3,) * 8, token_rate_div=2)
        s3 = S3Tokenizer(cfg)
        template = s3.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 16)), jnp.asarray([8]))
        with _pytest.raises(ValueError, match="not consumed"):
            convert_s3_tokenizer(sd, template)
        # and strict=False converts as before
        convert_s3_tokenizer(sd, template, strict=False)
