"""CAM++ conversion: activation-match a torch mirror of the public
3D-Speaker CAMPPlus (the module the reference's campplus.onnx is exported
from — cli/frontend.py:45,108-118) against our JAX CamPPEmbedding."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cosyvoice_tpu.models.campplus import CamPPConfig, CamPPEmbedding
from cosyvoice_tpu.tools.convert_checkpoint import convert_campplus


# ---------------------------------------------------------------------------
# torch mirror: the speakerlab CAMPPlus module graph, dims parameterized
# ---------------------------------------------------------------------------

def get_nonlinear(config_str, channels):
    nonlinear = torch.nn.Sequential()
    for name in config_str.split("-"):
        if name == "relu":
            nonlinear.add_module("relu", torch.nn.ReLU(inplace=True))
        elif name == "batchnorm":
            nonlinear.add_module("batchnorm", torch.nn.BatchNorm1d(channels))
        elif name == "batchnorm_":
            nonlinear.add_module("batchnorm", torch.nn.BatchNorm1d(channels, affine=False))
        else:
            raise ValueError(name)
    return nonlinear


class BasicResBlock(torch.nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_planes, planes, 3, stride=(stride, 1), padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.shortcut = torch.nn.Sequential()
        if stride != 1 or in_planes != planes:
            self.shortcut = torch.nn.Sequential(
                torch.nn.Conv2d(in_planes, planes, 1, stride=(stride, 1), bias=False),
                torch.nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        out = out + self.shortcut(x)
        return F.relu(out)


class FCM(torch.nn.Module):
    def __init__(self, m_channels=32, feat_dim=80):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(1, m_channels, 3, padding=1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(m_channels)
        self.layer1 = torch.nn.Sequential(
            BasicResBlock(m_channels, m_channels, stride=2),
            BasicResBlock(m_channels, m_channels, stride=1),
        )
        self.layer2 = torch.nn.Sequential(
            BasicResBlock(m_channels, m_channels, stride=2),
            BasicResBlock(m_channels, m_channels, stride=1),
        )
        self.conv2 = torch.nn.Conv2d(m_channels, m_channels, 3, stride=(2, 1), padding=1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(m_channels)
        self.out_channels = m_channels * (feat_dim // 8)

    def forward(self, x):  # x: (B, F, T)
        x = x.unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer1(out)
        out = self.layer2(out)
        out = F.relu(self.bn2(self.conv2(out)))
        shape = out.shape
        return out.reshape(shape[0], shape[1] * shape[2], shape[3])


class TDNNLayer(torch.nn.Module):
    def __init__(self, in_ch, out_ch, kernel, stride=1, padding=0, dilation=1,
                 bias=False, config_str="batchnorm-relu"):
        super().__init__()
        if padding < 0:
            padding = (kernel - 1) // 2 * dilation
        self.linear = torch.nn.Conv1d(in_ch, out_ch, kernel, stride=stride,
                                      padding=padding, dilation=dilation, bias=bias)
        self.nonlinear = get_nonlinear(config_str, out_ch)

    def forward(self, x):
        return self.nonlinear(self.linear(x))


class CAMLayer(torch.nn.Module):
    def __init__(self, bn_channels, out_ch, kernel, stride, padding, dilation,
                 bias, reduction=2, seg_len=100):
        super().__init__()
        self.seg_len = seg_len
        self.linear_local = torch.nn.Conv1d(bn_channels, out_ch, kernel, stride=stride,
                                            padding=padding, dilation=dilation, bias=bias)
        self.linear1 = torch.nn.Conv1d(bn_channels, bn_channels // reduction, 1)
        self.linear2 = torch.nn.Conv1d(bn_channels // reduction, out_ch, 1)

    def seg_pooling(self, x):
        seg = F.avg_pool1d(x, kernel_size=self.seg_len, stride=self.seg_len, ceil_mode=True)
        shape = seg.shape
        seg = seg.unsqueeze(-1).expand(*shape, self.seg_len).reshape(*shape[:-1], -1)
        return seg[..., : x.shape[-1]]

    def forward(self, x):
        y = self.linear_local(x)
        context = x.mean(-1, keepdim=True) + self.seg_pooling(x)
        context = F.relu(self.linear1(context))
        m = torch.sigmoid(self.linear2(context))
        return y * m


class CAMDenseTDNNLayer(torch.nn.Module):
    def __init__(self, in_ch, out_ch, bn_channels, kernel, dilation=1,
                 config_str="batchnorm-relu", seg_len=100):
        super().__init__()
        padding = (kernel - 1) // 2 * dilation
        self.nonlinear1 = get_nonlinear(config_str, in_ch)
        self.linear1 = torch.nn.Conv1d(in_ch, bn_channels, 1, bias=False)
        self.nonlinear2 = get_nonlinear(config_str, bn_channels)
        self.cam_layer = CAMLayer(bn_channels, out_ch, kernel, stride=1,
                                  padding=padding, dilation=dilation, bias=False,
                                  seg_len=seg_len)

    def forward(self, x):
        x = self.linear1(self.nonlinear1(x))
        return self.cam_layer(self.nonlinear2(x))


class CAMDenseTDNNBlock(torch.nn.Module):
    def __init__(self, num_layers, in_ch, out_ch, bn_channels, kernel,
                 dilation=1, config_str="batchnorm-relu", seg_len=100):
        super().__init__()
        for i in range(num_layers):
            self.add_module(
                f"tdnnd{i + 1}",
                CAMDenseTDNNLayer(in_ch + i * out_ch, out_ch, bn_channels,
                                  kernel, dilation, config_str, seg_len))

    def forward(self, x):
        for layer in self.children():
            x = torch.cat([x, layer(x)], dim=1)
        return x


class TransitLayer(torch.nn.Module):
    def __init__(self, in_ch, out_ch, bias=False, config_str="batchnorm-relu"):
        super().__init__()
        self.nonlinear = get_nonlinear(config_str, in_ch)
        self.linear = torch.nn.Conv1d(in_ch, out_ch, 1, bias=bias)

    def forward(self, x):
        return self.linear(self.nonlinear(x))


class DenseLayer(torch.nn.Module):
    def __init__(self, in_ch, out_ch, bias=False, config_str="batchnorm-relu"):
        super().__init__()
        self.linear = torch.nn.Conv1d(in_ch, out_ch, 1, bias=bias)
        self.nonlinear = get_nonlinear(config_str, out_ch)

    def forward(self, x):
        if len(x.shape) == 2:
            x = self.linear(x.unsqueeze(-1)).squeeze(-1)
        else:
            x = self.linear(x)
        return self.nonlinear(x)


class StatsPool(torch.nn.Module):
    def forward(self, x):  # (B, C, T)
        mean = x.mean(dim=-1)
        std = x.std(dim=-1, unbiased=True)
        return torch.cat([mean, std], dim=-1)


class TorchCAMPPlus(torch.nn.Module):
    def __init__(self, feat_dim=80, embedding_size=192, growth_rate=32,
                 bn_size=4, init_channels=128, m_channels=32,
                 blocks=((12, 3, 1), (24, 3, 2), (16, 3, 2)), seg_len=100):
        super().__init__()
        from collections import OrderedDict

        self.head = FCM(m_channels=m_channels, feat_dim=feat_dim)
        channels = self.head.out_channels
        self.xvector = torch.nn.Sequential(OrderedDict([
            ("tdnn", TDNNLayer(channels, init_channels, 5, stride=2, dilation=1, padding=-1)),
        ]))
        channels = init_channels
        for i, (num_layers, kernel, dilation) in enumerate(blocks):
            self.xvector.add_module(
                f"block{i + 1}",
                CAMDenseTDNNBlock(num_layers, channels, growth_rate,
                                  bn_size * growth_rate, kernel, dilation,
                                  seg_len=seg_len))
            channels += num_layers * growth_rate
            self.xvector.add_module(f"transit{i + 1}", TransitLayer(channels, channels // 2))
            channels //= 2
        self.xvector.add_module("out_nonlinear", get_nonlinear("batchnorm-relu", channels))
        self.xvector.add_module("stats", StatsPool())
        self.xvector.add_module("dense", DenseLayer(channels * 2, embedding_size,
                                                    config_str="batchnorm_"))

    def forward(self, x):  # (B, T, F)
        x = x.permute(0, 2, 1)
        x = self.head(x)
        return self.xvector(x)


def _randomize_bn_stats(model, rng):
    """Eval-mode BN uses running stats; fresh modules have mean 0 / var 1
    which would hide stat-mapping bugs — randomize them."""
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(torch.from_numpy(
                rng.standard_normal(m.running_mean.shape).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                rng.random(m.running_var.shape).astype(np.float32) + 0.5))


SMALL = dict(feat_dim=16, embedding_size=8, growth_rate=4, bn_size=2,
             init_channels=8, m_channels=4, blocks=((2, 3, 1), (2, 3, 2)), seg_len=4)
SMALL_CFG = CamPPConfig(feat_dim=16, embed_dim=8, m_channels=4, init_channels=8,
                        growth_rate=4, bn_size=2, blocks=((2, 3, 1), (2, 3, 2)), seg_len=4)


class TestCamPPConversion:
    @pytest.mark.parametrize("T", [27, 40])  # odd T exercises partial seg + stride
    def test_activation_match(self, T):
        torch.manual_seed(0)
        rng = np.random.default_rng(0)
        tm = TorchCAMPPlus(**SMALL).eval()
        with torch.no_grad():
            _randomize_bn_stats(tm, rng)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

        cam = CamPPEmbedding(SMALL_CFG)
        feats = rng.standard_normal((2, T, 16)).astype(np.float32)
        template = cam.init(jax.random.PRNGKey(0), jnp.asarray(feats))
        params = convert_campplus(sd, template)

        with torch.no_grad():
            ref = tm(torch.from_numpy(feats)).numpy()
        out = np.asarray(cam.apply(params, jnp.asarray(feats)))
        assert out.shape == ref.shape == (2, 8)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_full_size_shapes(self):
        """The default config matches the released campplus.onnx dims:
        80-mel in, 192-d out, FCM 320ch, blocks 12/24/16."""
        cam = CamPPEmbedding()
        template = jax.eval_shape(
            lambda: cam.init(jax.random.PRNGKey(0), jnp.zeros((1, 150, 80))))
        shapes = {"/".join(str(getattr(k, "key", k)) for k in p): l.shape
                  for p, l in jax.tree_util.tree_leaves_with_path(template)}
        assert shapes["params/tdnn_linear/kernel"] == (5, 320, 128)
        assert shapes["params/block2/tdnnd24/linear1/kernel"] == (1, 256 + 23 * 32, 128)
        assert shapes["params/dense_linear/kernel"] == (1, 1024, 192)
        assert shapes["params/dense_bn/mean"] == (192,)

    def test_unconsumed_key_raises(self):
        torch.manual_seed(0)
        tm = TorchCAMPPlus(**SMALL).eval()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        sd["xvector.extra.weight"] = np.zeros((3, 3), np.float32)
        cam = CamPPEmbedding(SMALL_CFG)
        template = cam.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 16)))
        with pytest.raises(AssertionError, match="unconsumed"):
            convert_campplus(sd, template)
