"""Minimal torch implementation of the Matcha-TTS components the reference
imports, registered under the `matcha.*` module names.

The reference vendors Matcha-TTS as a git submodule
(/root/reference/third_party/Matcha-TTS — empty in this image), and
cosyvoice/flow/decoder.py:21-22 + flow_matching.py:17 import these leaf
blocks from it. This stub reproduces the public Matcha-TTS architecture
(itself an old-diffusers derivative) faithfully enough to (a) import the
reference's own decoder/CFM/flow classes unchanged and (b) give them the
exact state_dict key layout of the published checkpoints:

  Block1D        = Conv1d(k3,p1) -> GroupNorm(8) -> Mish, masked in/out
  ResnetBlock1D  = mlp(Mish+Linear) + block1/block2 + res_conv(k1)
  Downsample1D   = Conv1d(dim,dim,3,stride2,p1)
  Upsample1D     = ConvTranspose1d(dim,dim,4,2,1) (use_conv_transpose)
  TimestepEmbedding = Linear -> SiLU -> Linear
  SinusoidalPosEmb  = 1000*t sinusoid, [sin|cos]
  BasicTransformerBlock = LN(norm1) -> self-attn (to_q/k/v no bias,
      to_out.0 with bias, scale=dim_head^-0.5) -> LN(norm3) ->
      FeedForward(net.0 GELU proj, net.2 Linear)
  BASECFM        = base class holding solver/sigma_min config

Call install() BEFORE importing cosyvoice.flow.*.
"""

import math
import sys
import types
import importlib.machinery as _machinery

import torch
import torch.nn as nn
import torch.nn.functional as F


class SinusoidalPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x, scale=1000):
        if x.ndim < 1:
            x = x.unsqueeze(0)
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = torch.exp(torch.arange(half_dim, device=x.device).float() * -emb)
        emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class Block1D(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv1d(dim, dim_out, 3, padding=1),
            nn.GroupNorm(groups, dim_out),
            nn.Mish(),
        )

    def forward(self, x, mask):
        return self.block(x * mask) * mask


class ResnetBlock1D(nn.Module):
    def __init__(self, dim, dim_out, time_emb_dim, groups=8):
        super().__init__()
        self.mlp = nn.Sequential(nn.Mish(), nn.Linear(time_emb_dim, dim_out))
        self.block1 = Block1D(dim, dim_out, groups=groups)
        self.block2 = Block1D(dim_out, dim_out, groups=groups)
        self.res_conv = nn.Conv1d(dim, dim_out, 1)

    def forward(self, x, mask, time_emb):
        h = self.block1(x, mask)
        h = h + self.mlp(time_emb).unsqueeze(-1)
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class Downsample1D(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv = nn.Conv1d(dim, dim, 3, 2, 1)

    def forward(self, x):
        return self.conv(x)


class Upsample1D(nn.Module):
    def __init__(self, channels, use_conv=False, use_conv_transpose=False, out_channels=None, name="conv"):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        assert use_conv_transpose, "stub supports the conv-transpose variant the reference uses"
        self.conv = nn.ConvTranspose1d(channels, self.out_channels, 4, 2, 1)

    def forward(self, x):
        return self.conv(x)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim, act_fn="silu", out_dim=None, post_act_fn=None, cond_proj_dim=None):
        super().__init__()
        assert act_fn == "silu"
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class _Attention(nn.Module):
    """diffusers-style self-attention: qkv bias-free, out proj with bias."""

    def __init__(self, query_dim, heads, dim_head, dropout=0.0):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(query_dim, inner, bias=False)
        self.to_v = nn.Linear(query_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(dropout)])

    def forward(self, hidden_states, attention_mask=None):
        B, T, _ = hidden_states.shape
        H = self.heads
        q = self.to_q(hidden_states).view(B, T, H, -1).transpose(1, 2)
        k = self.to_k(hidden_states).view(B, T, H, -1).transpose(1, 2)
        v = self.to_v(hidden_states).view(B, T, H, -1).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-1, -2)) * self.scale
        if attention_mask is not None:
            # additive bias [B, T, T] broadcast over heads
            scores = scores + attention_mask[:, None, :, :]
        attn = scores.softmax(dim=-1)
        out = torch.matmul(attn, v).transpose(1, 2).reshape(B, T, -1)
        return self.to_out[0](out)


class _GELU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        return F.gelu(self.proj(x))


class _FeedForward(nn.Module):
    def __init__(self, dim, mult=4, dropout=0.0, activation_fn="gelu"):
        super().__init__()
        assert activation_fn == "gelu"
        inner = dim * mult
        self.net = nn.ModuleList([_GELU(dim, inner), nn.Dropout(dropout), nn.Linear(inner, dim)])

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim, dropout=0.0, activation_fn="gelu", **kw):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = _Attention(dim, num_attention_heads, attention_head_dim, dropout)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = _FeedForward(dim, dropout=dropout, activation_fn=activation_fn)

    def forward(self, hidden_states, attention_mask=None, timestep=None, **kw):
        h = self.attn1(self.norm1(hidden_states), attention_mask=attention_mask)
        x = h + hidden_states
        x = self.ff(self.norm3(x)) + x
        return x


class BASECFM(nn.Module):
    def __init__(self, n_feats, cfm_params, n_spks=1, spk_emb_dim=128):
        super().__init__()
        self.n_feats = n_feats
        self.n_spks = n_spks
        self.spk_emb_dim = spk_emb_dim
        self.solver = getattr(cfm_params, "solver", "euler")
        self.sigma_min = getattr(cfm_params, "sigma_min", 1e-4)


class AttrDict(dict):
    """omegaconf.DictConfig stand-in with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def install():
    """Register matcha.* (and light torchaudio/omegaconf/onnxruntime) stubs."""
    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = _machinery.ModuleSpec(name, loader=None)
        return m

    if "matcha" not in sys.modules:
        pkg = _mod("matcha")
        models = _mod("matcha.models")
        comps = _mod("matcha.models.components")
        dec = _mod("matcha.models.components.decoder")
        dec.SinusoidalPosEmb = SinusoidalPosEmb
        dec.Block1D = Block1D
        dec.ResnetBlock1D = ResnetBlock1D
        dec.Downsample1D = Downsample1D
        dec.TimestepEmbedding = TimestepEmbedding
        dec.Upsample1D = Upsample1D
        tfm = _mod("matcha.models.components.transformer")
        tfm.BasicTransformerBlock = BasicTransformerBlock
        fm = _mod("matcha.models.components.flow_matching")
        fm.BASECFM = BASECFM
        for m in (pkg, models, comps, dec, tfm, fm):
            sys.modules[m.__name__] = m

    if "torchaudio" not in sys.modules:
        ta = _mod("torchaudio")
        ta.load = None
        ta.save = None
        ta.__version__ = "0.0.0-stub"
        sys.modules["torchaudio"] = ta
        for sub in ("torchaudio.compliance", "torchaudio.compliance.kaldi"):
            sys.modules[sub] = _mod(sub)

    if "omegaconf" not in sys.modules:
        oc = _mod("omegaconf")
        oc.DictConfig = AttrDict
        sys.modules["omegaconf"] = oc
    else:
        # upgrade a plain-dict stub so cfm_params attribute access works
        if sys.modules["omegaconf"].DictConfig is dict:
            sys.modules["omegaconf"].DictConfig = AttrDict

    if "onnxruntime" not in sys.modules:
        ort = _mod("onnxruntime")
        ort.InferenceSession = object
        ort.SessionOptions = object
        sys.modules["onnxruntime"] = ort
