"""Pallas flash attention vs the einsum oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.ops.attention import reference_attention
from controlanimate_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("shape", [
    (2, 256, 2, 40),   # SD1.5 head dim 40 (needs padding to 128)
    (1, 512, 4, 64),
    (2, 256, 2, 128),
])
def test_flash_matches_reference(shape):
    B, N, H, D = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    shape = (1, 256, 2, 64)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], shape, jnp.bfloat16)
    k = jax.random.normal(ks[1], shape, jnp.bfloat16)
    v = jax.random.normal(ks[2], shape, jnp.bfloat16)
    out = flash_attention(q, k, v, interpret=True)
    ref = reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("block_q,block_k", [
    (128, 512),   # one-pass (block_k == N)
    (128, 128),   # online-softmax multi-block KV loop
    (512, 256),   # bq covers full N, two KV blocks
])
def test_flash_block_modes(block_q, block_k):
    shape = (2, 512, 2, 40)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    out = flash_attention(q, k, v, interpret=True, block_q=block_q, block_k=block_k)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
