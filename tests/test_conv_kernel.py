"""Pallas fused GN+SiLU+conv3x3 kernel vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.ops.conv_kernel import (
    conv3x3_fused,
    conv3x3_xla,
    groupnorm_fold,
)


def _inputs(B=2, H=16, W=16, Cin=128, Cout=128, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (B, H, W, Cin), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, Cin, Cout), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (Cout,), jnp.float32) * 0.1
    a = 1.0 + 0.1 * jax.random.normal(ks[3], (B, Cin), jnp.float32)
    b = 0.1 * jax.random.normal(ks[4], (B, Cin), jnp.float32)
    return x, kernel, bias, a, b


def test_plain_conv_matches_xla():
    x, kernel, bias, _, _ = _inputs()
    out = conv3x3_fused(x, kernel, bias, interpret=True)
    ref = conv3x3_xla(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_affine_silu_residual():
    x, kernel, bias, a, b = _inputs()
    res = jax.random.normal(jax.random.PRNGKey(9), x.shape[:3] + (128,), jnp.float32)
    out = conv3x3_fused(
        x, kernel, bias, affine=(a, b), act="silu", residual=res, interpret=True
    )
    ref = conv3x3_xla(x, kernel, bias, affine=(a, b), act="silu", residual=res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_multi_row_blocks_and_cout_blocks():
    # H=32 with rows_per_block=8 exercises interior halos; Cout=256 with
    # block_cout=128 exercises the persistent-scratch Cout loop
    x, kernel, bias, a, b = _inputs(B=1, H=32, W=16, Cin=128, Cout=256)
    out = conv3x3_fused(
        x, kernel, bias, affine=(a, b), act="silu",
        rows_per_block=8, block_cout=128, interpret=True,
    )
    ref = conv3x3_xla(x, kernel, bias, affine=(a, b), act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_groupnorm_fold_matches_module():
    from controlanimate_tpu.models.layers import GroupNorm

    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 8, 8, 128), jnp.float32)
    gn = GroupNorm(32)
    params = gn.init(key, x)["params"]
    # non-trivial scale/bias
    params = {
        "scale": 1.0 + 0.2 * jax.random.normal(key, (128,), jnp.float32),
        "bias": 0.3 * jax.random.normal(key, (128,), jnp.float32),
    }
    ref = gn.apply({"params": params}, x)
    a, b = groupnorm_fold(x, params["scale"], params["bias"], 32)
    out = x * a[:, None, None, :] + b[:, None, None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_unsupported_geometry_raises():
    x = jnp.zeros((1, 8, 8, 64), jnp.float32)  # 64 channels: not lane-aligned
    kernel = jnp.zeros((3, 3, 64, 128), jnp.float32)
    with pytest.raises(ValueError):
        conv3x3_fused(x, kernel, jnp.zeros((128,)), interpret=True)


def test_vae_resnet_fused_matches_xla_path():
    """The VAE resnet with the Pallas fused path (interpret mode) must match
    the XLA path bit-for-bit-ish; also proves the param tree is unchanged."""
    from controlanimate_tpu.models.vae import VaeResnetBlock
    from controlanimate_tpu.ops import conv_kernel as ck

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 128), jnp.float32)
    block = VaeResnetBlock(out_channels=128, groups=32)
    params = block.init(key, x)["params"]
    assert set(params) == {"norm1", "conv1", "norm2", "conv2"}
    assert set(params["conv1"]) == {"kernel", "bias"}
    assert params["conv1"]["kernel"].shape == (3, 3, 128, 128)
    ref = block.apply({"params": params}, x)
    ck.set_conv_kernel_enabled(True)
    try:
        out = block.apply({"params": params}, x)
    finally:
        ck.set_conv_kernel_enabled(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_vae_upsample_fused_matches_xla_path():
    from controlanimate_tpu.models.vae import Upsample2D
    from controlanimate_tpu.ops import conv_kernel as ck

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 8, 8, 128), jnp.float32)
    up = Upsample2D(out_channels=128)
    params = up.init(key, x)["params"]
    assert set(params) == {"conv"}
    ref = up.apply({"params": params}, x)
    ck.set_conv_kernel_enabled(True)
    try:
        out = up.apply({"params": params}, x)
    finally:
        ck.set_conv_kernel_enabled(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
