"""Parity-decomposed upsample+conv vs the naive resize-then-conv oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.ops.upsample import (
    upsample2x_conv3x3,
    upsample2x_conv3x3_transposed,
)


def _oracle(x, kernel, bias):
    B, H, W, C = x.shape
    up = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
    return jax.lax.conv_general_dilated(
        up, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias


@pytest.mark.parametrize("shape", [(2, 8, 8, 16, 16), (1, 5, 7, 8, 24)])
def test_matches_resize_conv(shape):
    B, H, W, Ci, Co = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (B, H, W, Ci), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, Ci, Co), jnp.float32) * 0.1
    bias = jax.random.normal(ks[2], (Co,), jnp.float32) * 0.1
    out = upsample2x_conv3x3(x, kernel, bias)
    ref = _oracle(x, kernel, bias)
    assert out.shape == ref.shape == (B, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("shape", [(2, 8, 8, 16, 16), (1, 5, 7, 8, 24)])
def test_transposed_matches_resize_conv(shape):
    """The single-lhs-dilated-conv form of the same decomposition (used when
    CONTROLANIMATE_UPSAMPLE_FORM=transposed) is exact too, odd sizes incl."""
    B, H, W, Ci, Co = shape
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (B, H, W, Ci), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, Ci, Co), jnp.float32) * 0.1
    bias = jax.random.normal(ks[2], (Co,), jnp.float32) * 0.1
    out = upsample2x_conv3x3_transposed(x, kernel, bias)
    ref = _oracle(x, kernel, bias)
    assert out.shape == ref.shape == (B, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_form_env_switch(monkeypatch):
    """upsample2x_conv3x3 dispatches to the transposed form via env var."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(ks[0], (1, 6, 6, 8), jnp.float32)
    kernel = jax.random.normal(ks[1], (3, 3, 8, 8), jnp.float32) * 0.1
    bias = jnp.zeros((8,), jnp.float32)
    base = upsample2x_conv3x3(x, kernel, bias)
    monkeypatch.setenv("CONTROLANIMATE_UPSAMPLE_FORM", "transposed")
    switched = upsample2x_conv3x3(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(switched), np.asarray(base), atol=2e-5, rtol=1e-4)


def test_vae_upsample_uses_decomposition():
    """Upsample2D output must be identical to the resize+conv formulation."""
    from controlanimate_tpu.models.vae import Upsample2D

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 8, 8, 128), jnp.float32)
    up = Upsample2D(out_channels=128)
    params = up.init(key, x)["params"]
    out = up.apply({"params": params}, x)
    ref = _oracle(x, params["conv"]["kernel"], params["conv"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_unet_upsample3d_uses_decomposition():
    from controlanimate_tpu.models.resnet3d import Upsample3D

    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 2, 8, 8, 32), jnp.float32)
    up = Upsample3D(out_channels=32)
    params = up.init(key, x)["params"]
    out = up.apply({"params": params}, x)
    flat = x.reshape(2, 8, 8, 32)
    ref = _oracle(flat, params["conv"]["conv"]["kernel"], params["conv"]["conv"]["bias"])
    np.testing.assert_allclose(
        np.asarray(out).reshape(2, 16, 16, 32), np.asarray(ref), atol=2e-5, rtol=1e-4
    )
