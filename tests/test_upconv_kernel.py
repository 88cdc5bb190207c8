"""Pallas up-stage conv kernels (ops/upconv_kernel.py) vs the XLA oracles,
interpret mode on CPU — exactness of the im2col matmul form and of the
parity-folded s2d upsample-conv (the RealESRGAN x4 tail's hot geometry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.ops.upconv_kernel import (
    conv3x3_small,
    d2s,
    fold_upsample_kernel_s2d,
    upsample2x_conv3x3_s2d,
)
from controlanimate_tpu.ops.upsample import upsample2x_conv3x3


def _conv_xla(x, k, b):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


@pytest.mark.parametrize("shape", [(1, 8, 16, 8, 8), (2, 16, 32, 16, 8),
                                   (1, 12, 16, 8, 16)])
def test_conv3x3_small_matches_xla(shape):
    B, H, W, Ci, Co = shape
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, Ci), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, Ci, Co) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(Co), jnp.float32)
    want = _conv_xla(x, k, b)
    got = conv3x3_small(x, k, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_small_lrelu_epilogue():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 8, 16, 8), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(8), jnp.float32)
    want = jax.nn.leaky_relu(_conv_xla(x, k, b), 0.2)
    got = conv3x3_small(x, k, b, act="lrelu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(1, 8, 16, 8, 8), (1, 16, 16, 16, 8)])
def test_upsample_s2d_matches_parity_oracle(shape):
    """d2s(kernel output) == the exact nearest-2x+conv3x3 composite
    (ops/upsample.py, itself golden vs the naive form)."""
    B, H, W, Ci, Co = shape
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(B, H, W, Ci), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, Ci, Co) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(Co), jnp.float32)
    want = upsample2x_conv3x3(x, k, b)
    got = d2s(upsample2x_conv3x3_s2d(x, k, b, interpret=True))
    assert got.shape == (B, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_upsample_s2d_lrelu():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 8, 8, 8), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(8), jnp.float32)
    want = jax.nn.leaky_relu(upsample2x_conv3x3(x, k, b), 0.2)
    got = d2s(upsample2x_conv3x3_s2d(x, k, b, act="lrelu", interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fold_upsample_kernel_structure():
    """Each output parity channel uses exactly its 2x2 coarse tap window
    (the other 5 of 9 taps are structurally zero)."""
    Ci, Co = 2, 3
    rs = np.random.RandomState(4)
    k = jnp.asarray(rs.randn(3, 3, Ci, Co), jnp.float32)
    w = np.asarray(fold_upsample_kernel_s2d(k)).reshape(3, 3, Ci, 4 * Co)
    for p in (0, 1):
        for q in (0, 1):
            cols = slice((2 * p + q) * Co, (2 * p + q) * Co + Co)
            block = w[:, :, :, cols]
            live = np.zeros((3, 3), bool)
            live[p:p + 2, q:q + 2] = True
            assert np.all(block[~live] == 0)
            assert np.any(block[live] != 0)


def test_bf16_path_close_to_f32():
    rs = np.random.RandomState(5)
    x32 = rs.randn(1, 8, 16, 8).astype(np.float32)
    k32 = (rs.randn(3, 3, 8, 8) * 0.1).astype(np.float32)
    b32 = rs.randn(8).astype(np.float32)
    want = np.asarray(conv3x3_small(jnp.asarray(x32), jnp.asarray(k32),
                                    jnp.asarray(b32), interpret=True))
    got = np.asarray(conv3x3_small(
        jnp.asarray(x32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(b32), interpret=True)).astype(np.float32)
    assert np.abs(got - want).max() < 0.15  # bf16 input/weight rounding


def test_rrdbnet_body_tail_composition_matches_full():
    """tail(body(x)) == full(x): the Upscaler's two-program split (the
    Pallas tail in its own jit — mixing it into the body's program poisoned
    the body's layouts, perf/upconv_r5.json) is numerically the same net."""
    from controlanimate_tpu.models.upscaler import RRDBNet

    net = RRDBNet(num_feat=8, num_block=1, form="sum")
    x = jnp.asarray(np.random.RandomState(6).rand(1, 8, 8, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    full = net.apply(params, x)
    feat = net.apply(params, x, mode="body")
    assert feat.shape == (1, 8, 8, 8)
    tail = net.apply(params, feat, mode="tail")
    assert tail.shape == full.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(tail), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(1, 8, 16, 8, 8), (2, 16, 16, 16, 8)])
def test_upsample_fine_matches_s2d(shape):
    """The 'rows' emit path (explicit py axis + free reshape) == d2s of the
    s2d output == the parity oracle."""
    from controlanimate_tpu.ops.upconv_kernel import upsample2x_conv3x3_fine

    B, H, W, Ci, Co = shape
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(B, H, W, Ci), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, Ci, Co) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(Co), jnp.float32)
    want = upsample2x_conv3x3(x, k, b)
    got = upsample2x_conv3x3_fine(x, k, b, interpret=True)
    assert got.shape == (B, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    got_l = upsample2x_conv3x3_fine(x, k, b, act="lrelu", interpret=True)
    np.testing.assert_allclose(np.asarray(got_l),
                               np.asarray(jax.nn.leaky_relu(want, 0.2)),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("via", ["rows", "fine"])
def test_upsample_fine_emit_variants(via):
    from controlanimate_tpu.ops.upconv_kernel import upsample2x_conv3x3_fine

    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(2, 8, 16, 8), jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(8), jnp.float32)
    want = jax.nn.leaky_relu(upsample2x_conv3x3(x, k, b), 0.2)
    got = upsample2x_conv3x3_fine(x, k, b, act="lrelu", interpret=True, via=via)
    assert got.shape == (2, 16, 32, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
