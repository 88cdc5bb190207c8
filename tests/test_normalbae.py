"""NormalBae NNET golden tests: Flax port vs a torch oracle that mirrors the
architecture the reference runs through controlnet_aux
(modules/controlresiduals_pipeline.py:56-62 -> NNET with a gen-efficientnet
tf_efficientnet_b5_ap backbone), with the scannet.pt state-dict key layout."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn
import torch.nn.functional as F

from controlanimate_tpu.models.annotators.normalbae_net import (

    EffNetConfig,
    NormalBaeNNET,
    nnet_params_from_torch,
)

pytestmark = pytest.mark.slow  # heavy torch golden build (use --runslow)

TINY = EffNetConfig(
    stem=8, widths=(8, 8, 16, 16, 16, 24, 24), repeats=(1, 1, 1, 1, 1, 1, 1),
    expands=(1, 6, 6, 6, 6, 6, 6), kernels=(3, 3, 5, 3, 5, 5, 3),
    strides=(1, 2, 2, 2, 1, 2, 1), head=32,
)
DEC_FEATURES = (24, 16, 12, 8)
HIDDEN = 8


class Conv2dSame(tn.Conv2d):
    """TF 'SAME' padding (gen-efficientnet Conv2dSame): asymmetric, extra on
    the bottom/right — identical to XLA's SAME convention."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class TorchSE(tn.Module):
    def __init__(self, chs, in_chs):
        super().__init__()
        red = max(1, int(in_chs * 0.25))
        self.conv_reduce = tn.Conv2d(chs, red, 1, bias=True)
        self.conv_expand = tn.Conv2d(red, chs, 1, bias=True)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class TorchDS(tn.Module):
    """gen-efficientnet DepthwiseSeparableConv (expand ratio 1)."""

    def __init__(self, in_chs, out_chs, k, s, bn_eps):
        super().__init__()
        self.conv_dw = Conv2dSame(in_chs, in_chs, k, stride=s, groups=in_chs, bias=False)
        self.bn1 = tn.BatchNorm2d(in_chs, eps=bn_eps)
        self.se = TorchSE(in_chs, in_chs)
        self.conv_pw = tn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = tn.BatchNorm2d(out_chs, eps=bn_eps)
        self.has_skip = s == 1 and in_chs == out_chs

    def forward(self, x):
        r = x
        x = F.silu(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn2(self.conv_pw(x))
        return x + r if self.has_skip else x


class TorchIR(tn.Module):
    """gen-efficientnet InvertedResidual (MBConv)."""

    def __init__(self, in_chs, out_chs, k, s, expand, bn_eps):
        super().__init__()
        mid = in_chs * expand
        self.conv_pw = tn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = tn.BatchNorm2d(mid, eps=bn_eps)
        self.conv_dw = Conv2dSame(mid, mid, k, stride=s, groups=mid, bias=False)
        self.bn2 = tn.BatchNorm2d(mid, eps=bn_eps)
        self.se = TorchSE(mid, in_chs)
        self.conv_pwl = tn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = tn.BatchNorm2d(out_chs, eps=bn_eps)
        self.has_skip = s == 1 and in_chs == out_chs

    def forward(self, x):
        r = x
        x = F.silu(self.bn1(self.conv_pw(x)))
        x = F.silu(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        return x + r if self.has_skip else x


class TorchEffNet(tn.Module):
    """GenEfficientNet subset: conv_stem/bn1, blocks (ModuleList of stage
    ModuleLists -> keys blocks.{s}.{i}.*), conv_head."""

    def __init__(self, cfg: EffNetConfig):
        super().__init__()
        self.conv_stem = Conv2dSame(3, cfg.stem, 3, stride=2, bias=False)
        self.bn1 = tn.BatchNorm2d(cfg.stem, eps=cfg.bn_eps)
        blocks = []
        in_chs = cfg.stem
        for s in range(7):
            stage = []
            for i in range(cfg.repeats[s]):
                stride = cfg.strides[s] if i == 0 else 1
                if cfg.expands[s] == 1:
                    stage.append(TorchDS(in_chs, cfg.widths[s], cfg.kernels[s],
                                         stride, cfg.bn_eps))
                else:
                    stage.append(TorchIR(in_chs, cfg.widths[s], cfg.kernels[s],
                                         stride, cfg.expands[s], cfg.bn_eps))
                in_chs = cfg.widths[s]
            blocks.append(tn.ModuleList(stage))
        self.blocks = tn.ModuleList(blocks)
        self.conv_head = tn.Conv2d(in_chs, cfg.head, 1, bias=False)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        outs = []
        for stage in self.blocks:
            for blk in stage:
                x = blk(x)
            outs.append(x)
        return [outs[0], outs[1], outs[2], outs[4], self.conv_head(outs[6])]


def torch_norm_normalize(out):
    n, kappa = out[:, :3], out[:, 3:]
    norm = torch.sqrt(torch.sum(n**2, dim=1, keepdim=True)) + 1e-10
    kappa = F.elu(kappa) + 1.0 + 0.01
    return torch.cat([n / norm, kappa], dim=1)


class TorchUpSampleBN(tn.Module):
    def __init__(self, skip_input, out_chs):
        super().__init__()
        self._net = tn.Sequential(
            tn.Conv2d(skip_input, out_chs, 3, padding=1),
            tn.BatchNorm2d(out_chs),
            tn.LeakyReLU(),
            tn.Conv2d(out_chs, out_chs, 3, padding=1),
            tn.BatchNorm2d(out_chs),
            tn.LeakyReLU(),
        )

    def forward(self, x, skip):
        x = F.interpolate(x, size=skip.shape[-2:], mode="bilinear", align_corners=True)
        return self._net(torch.cat([x, skip], dim=1))


def _head(in_chs, hidden):
    return tn.Sequential(
        tn.Conv1d(in_chs, hidden, 1), tn.ReLU(),
        tn.Conv1d(hidden, hidden, 1), tn.ReLU(),
        tn.Conv1d(hidden, hidden, 1), tn.ReLU(),
        tn.Conv1d(hidden, 4, 1),
    )


class TorchDecoder(tn.Module):
    """surface_normal_uncertainty Decoder, dense test-mode forward."""

    def __init__(self, cfg: EffNetConfig, features, hidden):
        super().__init__()
        w = cfg.widths
        self.conv2 = tn.Conv2d(cfg.head, cfg.head, 1)
        self.up1 = TorchUpSampleBN(cfg.head + w[4], features[0])
        self.up2 = TorchUpSampleBN(features[0] + w[2], features[1])
        self.up3 = TorchUpSampleBN(features[1] + w[1], features[2])
        self.up4 = TorchUpSampleBN(features[2] + w[0], features[3])
        self.out_conv_res8 = tn.Conv2d(features[1], 4, 3, padding=1)
        self.out_conv_res4 = _head(features[1] + 4, hidden)
        self.out_conv_res2 = _head(features[2] + 4, hidden)
        self.out_conv_res1 = _head(features[3] + 4, hidden)

    def forward(self, feats):
        b0, b1, b2, b4, head = feats
        x_d0 = self.conv2(head)
        x_d1 = self.up1(x_d0, b4)
        x_d2 = self.up2(x_d1, b2)
        x_d3 = self.up3(x_d2, b1)
        x_d4 = self.up4(x_d3, b0)
        out_res8 = torch_norm_normalize(self.out_conv_res8(x_d2))

        def refine(feat, prev, headm):
            fm = F.interpolate(feat, scale_factor=2, mode="bilinear", align_corners=True)
            pr = F.interpolate(prev, scale_factor=2, mode="bilinear", align_corners=True)
            cat = torch.cat([fm, pr], dim=1)
            B, C, H, W = cat.shape
            out = headm(cat.view(B, C, -1)).view(B, 4, H, W)
            return torch_norm_normalize(out)

        out_res4 = refine(x_d2, out_res8, self.out_conv_res4)
        out_res2 = refine(x_d3, out_res4, self.out_conv_res2)
        out_res1 = refine(x_d4, out_res2, self.out_conv_res1)
        return out_res1


class TorchNNET(tn.Module):
    def __init__(self, cfg, features, hidden):
        super().__init__()
        self.encoder = tn.Module()
        self.encoder.original_model = TorchEffNet(cfg)
        self.decoder = TorchDecoder(cfg, features, hidden)

    def forward(self, x):
        return self.decoder(self.encoder.original_model(x))


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    tm = TorchNNET(TINY, DEC_FEATURES, HIDDEN).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    return tm


def test_nnet_golden_vs_torch(oracle):
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = nnet_params_from_torch(sd, TINY)
    model = NormalBaeNNET(effnet=TINY, dec_features=DEC_FEATURES, hidden=HIDDEN)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    got_nchw = got.transpose(0, 3, 1, 2)
    assert got_nchw.shape == want.shape == (1, 4, 64, 64)
    np.testing.assert_allclose(got_nchw, want, atol=1e-4)
    # unit normals
    norms = np.linalg.norm(got[..., :3], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_nnet_module_prefix_stripped(oracle):
    """scannet.pt ships DataParallel 'module.'-prefixed keys."""
    sd = {f"module.{k}": v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = nnet_params_from_torch(sd, TINY)
    assert "conv_stem" in params["encoder"]


def test_nnet_odd_input_size(oracle):
    """TF-SAME padding path: non-power-of-two inputs still produce
    full-resolution output."""
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = nnet_params_from_torch(sd, TINY)
    model = NormalBaeNNET(effnet=TINY, dec_features=DEC_FEATURES, hidden=HIDDEN)
    x = np.random.RandomState(1).rand(1, 96, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x))).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_b5_geometry_feature_channels():
    """The full-size config must produce the channel/stride contract the
    scannet.pt decoder expects (24/40/64/176 skips + 2048 head)."""
    cfg = EffNetConfig()
    assert cfg.widths == (24, 40, 64, 128, 176, 304, 512)
    assert cfg.stem == 48 and cfg.head == 2048
    from controlanimate_tpu.models.annotators.normalbae_net import EfficientNetFeatures

    m = EfficientNetFeatures(cfg)
    shapes = jax.eval_shape(
        lambda x: m.init_with_output(jax.random.PRNGKey(0), x)[0],
        jnp.zeros((1, 64, 64, 3)),
    )
    chans = [s.shape for s in shapes]
    assert chans[0] == (1, 32, 32, 24)   # stage0 @ H/2
    assert chans[1] == (1, 16, 16, 40)   # stage1 @ H/4
    assert chans[2] == (1, 8, 8, 64)     # stage2 @ H/8
    assert chans[3] == (1, 4, 4, 176)    # stage4 @ H/16
    assert chans[4] == (1, 2, 2, 2048)   # conv_head @ H/32
