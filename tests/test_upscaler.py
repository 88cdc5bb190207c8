"""RealESRGAN (RRDBNet) upscaler: golden vs an independent torch mirror of
the basicsr network, plus the Upscaler facade paths (reference:
modules/upscaler.py:17-74, basicsr RRDBNet / RealESRGAN_x4plus_anime_6B)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from controlanimate_tpu.models.upscaler import (
    RRDBNet,
    Upscaler,
    rrdbnet_params_from_torch,
)


# --------------------------------------------------------------------------
# torch mirror (basicsr rrdbnet_arch semantics, state_dict keys match the
# RealESRGAN checkpoint layout: body.{i}.rdb{r}.conv{c}.weight etc.)
# --------------------------------------------------------------------------


class _RDBT(nn.Module):
    def __init__(self, feat, growth=32):
        super().__init__()
        self.conv1 = nn.Conv2d(feat, growth, 3, 1, 1)
        self.conv2 = nn.Conv2d(feat + growth, growth, 3, 1, 1)
        self.conv3 = nn.Conv2d(feat + 2 * growth, growth, 3, 1, 1)
        self.conv4 = nn.Conv2d(feat + 3 * growth, growth, 3, 1, 1)
        self.conv5 = nn.Conv2d(feat + 4 * growth, feat, 3, 1, 1)

    def forward(self, x):
        l = lambda t: F.leaky_relu(t, 0.2)
        x1 = l(self.conv1(x))
        x2 = l(self.conv2(torch.cat([x, x1], 1)))
        x3 = l(self.conv3(torch.cat([x, x1, x2], 1)))
        x4 = l(self.conv4(torch.cat([x, x1, x2, x3], 1)))
        x5 = self.conv5(torch.cat([x, x1, x2, x3, x4], 1))
        return x + 0.2 * x5


class _RRDBT(nn.Module):
    def __init__(self, feat):
        super().__init__()
        self.rdb1, self.rdb2, self.rdb3 = _RDBT(feat), _RDBT(feat), _RDBT(feat)

    def forward(self, x):
        return x + 0.2 * self.rdb3(self.rdb2(self.rdb1(x)))


class _TorchRRDBNet(nn.Module):
    def __init__(self, num_feat=64, num_block=6):
        super().__init__()
        self.conv_first = nn.Conv2d(3, num_feat, 3, 1, 1)
        self.body = nn.ModuleList([_RRDBT(num_feat) for _ in range(num_block)])
        self.conv_body = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_up1 = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_up2 = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_hr = nn.Conv2d(num_feat, num_feat, 3, 1, 1)
        self.conv_last = nn.Conv2d(num_feat, 3, 3, 1, 1)

    def forward(self, x):
        l = lambda t: F.leaky_relu(t, 0.2)
        feat = self.conv_first(x)
        body = feat
        for b in self.body:
            body = b(body)
        feat = feat + self.conv_body(body)
        feat = l(self.conv_up1(F.interpolate(feat, scale_factor=2, mode="nearest")))
        feat = l(self.conv_up2(F.interpolate(feat, scale_factor=2, mode="nearest")))
        return self.conv_last(l(self.conv_hr(feat)))


def _randomize(m, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def test_rrdbnet_matches_torch_oracle():
    tm = _TorchRRDBNet(num_feat=16, num_block=1).eval()
    _randomize(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = rrdbnet_params_from_torch(sd, num_block=1)
    model = RRDBNet(num_feat=16, num_block=1)

    x = np.random.RandomState(0).rand(1, 6, 6, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == (1, 24, 24, 3)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def synthetic_ckpt(tmp_path_factory):
    """RealESRGAN-layout checkpoint ({'params_ema': ...}) at facade geometry
    (num_feat=64) with a single block."""
    tm = _TorchRRDBNet(num_feat=64, num_block=1)
    _randomize(tm, seed=1)
    path = tmp_path_factory.mktemp("upscaler") / "RealESRGAN_tiny.pth"
    torch.save({"params_ema": tm.state_dict()}, path)
    return str(path)


def test_upscaler_facade_batch(synthetic_ckpt):
    up = Upscaler(scale=4.0, model_path=synthetic_ckpt, num_block=1)
    frames = (np.random.RandomState(1).rand(2, 8, 8, 3) * 255).astype(np.uint8)
    out = up.upscale_batch(frames)
    assert out.shape == (2, 32, 32, 3) and out.dtype == np.uint8

    dev = up.upscale_batch_device(jnp.asarray(frames))
    assert dev.shape == (2, 32, 32, 3) and dev.dtype == jnp.uint8
    # host and device paths agree to the u8 rounding boundary (the host
    # path's *255+0.5 promotes to f64; the device path stays f32)
    diff = np.abs(np.asarray(dev).astype(np.int16) - out.astype(np.int16))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_upscaler_bf16_compute_dtype(synthetic_ckpt):
    """dtype= is the compute dtype (params stay f32) — the TPU analog of the
    reference's RealESRGANer half=True (modules/upscaler.py:50), passed by
    the orchestrator for bf16 runs. bf16 output stays within a few u8 LSB of
    the f32 path on a smooth input."""
    up32 = Upscaler(scale=4.0, model_path=synthetic_ckpt, num_block=1)
    up16 = Upscaler(scale=4.0, model_path=synthetic_ckpt, num_block=1,
                    dtype=jnp.bfloat16)
    # params stay f32 regardless of the compute dtype
    leaf = jax.tree_util.tree_leaves(up16.params)[0]
    assert leaf.dtype == jnp.float32
    frames = (np.random.RandomState(2).rand(1, 8, 8, 3) * 255).astype(np.uint8)
    a = up32.upscale_batch(frames).astype(np.int16)
    b = up16.upscale_batch(frames).astype(np.int16)
    assert b.shape == a.shape
    assert np.abs(a - b).max() <= 12  # bf16 mantissa: ~3 u8 LSB per conv chain


def test_upscaler_scale_range(synthetic_ckpt):
    with pytest.raises(ValueError):
        Upscaler(scale=8.0, model_path=synthetic_ckpt)
    with pytest.raises(ValueError):
        Upscaler(scale=1.0, model_path=synthetic_ckpt)


def test_rdb_sum_form_matches_concat_form():
    """The TPU dataflow (kernel-split sum, no concats — see the
    ResidualDenseBlock docstring and perf/uptrace_r4.log) is the same
    function as the torch-literal concat form up to float reassociation."""
    tm = _TorchRRDBNet(num_feat=64, num_block=1).eval()
    _randomize(tm, seed=3)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = rrdbnet_params_from_torch(sd, num_block=1)
    x = np.random.RandomState(5).rand(1, 8, 8, 3).astype(np.float32)
    a = RRDBNet(num_feat=64, num_block=1, form="sum").apply(
        {"params": params}, jnp.asarray(x))
    b = RRDBNet(num_feat=64, num_block=1, form="concat").apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)
    # both forms consume the identical param tree
    ta = jax.tree_util.tree_structure(
        RRDBNet(num_feat=64, num_block=1, form="sum").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))["params"])
    tb = jax.tree_util.tree_structure(
        RRDBNet(num_feat=64, num_block=1, form="concat").init(
            jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 3)))["params"])
    assert ta == tb


def test_rdb_s2d_form_matches_concat_form():
    """form='s2d' runs the body at (H/2, W/2, 4C) with phase-structured
    kernels (lane-exact channels on TPU); exact same function up to float
    reassociation. Odd inputs fall back to the sum form."""
    tm = _TorchRRDBNet(num_feat=64, num_block=2).eval()
    _randomize(tm, seed=4)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = rrdbnet_params_from_torch(sd, num_block=2)
    x = np.random.RandomState(6).rand(1, 8, 8, 3).astype(np.float32)
    a = RRDBNet(num_feat=64, num_block=2, form="s2d").apply(
        {"params": params}, jnp.asarray(x))
    b = RRDBNet(num_feat=64, num_block=2, form="concat").apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-5)
    # odd spatial dims: the s2d body is skipped, result still correct
    x_odd = np.random.RandomState(7).rand(1, 7, 7, 3).astype(np.float32)
    a_odd = RRDBNet(num_feat=64, num_block=2, form="s2d").apply(
        {"params": params}, jnp.asarray(x_odd))
    b_odd = RRDBNet(num_feat=64, num_block=2, form="concat").apply(
        {"params": params}, jnp.asarray(x_odd))
    np.testing.assert_allclose(np.asarray(a_odd), np.asarray(b_odd),
                               atol=3e-5, rtol=1e-5)


def test_upscaler_split_pallas_tail_matches_full(synthetic_ckpt, monkeypatch):
    """CONTROLANIMATE_UP_KERNEL=force drives the product two-program path
    (body jit + Pallas-tail jit, interpret kernels on CPU) through both
    facade entries; output matches the single-program XLA path to the u8
    rounding boundary."""
    frames = (np.random.RandomState(3).rand(2, 8, 8, 3) * 255).astype(np.uint8)
    monkeypatch.setenv("CONTROLANIMATE_UP_KERNEL", "0")
    ref = Upscaler(4.0, model_path=synthetic_ckpt, num_block=1).upscale_batch(frames)
    monkeypatch.setenv("CONTROLANIMATE_UP_KERNEL", "force")
    up = Upscaler(4.0, model_path=synthetic_ckpt, num_block=1)
    assert up._split_ok(8, 8)
    got = up.upscale_batch(frames)
    assert np.abs(got.astype(np.int16) - ref.astype(np.int16)).max() <= 1
    dev = np.asarray(up.upscale_batch_device(jnp.asarray(frames)))
    assert np.abs(dev.astype(np.int16) - ref.astype(np.int16)).max() <= 1
