"""Primitive-layer numerics vs torch functional ops (conv, groupnorm,
attention) — validates layout conventions underpinning all weight mappings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from controlanimate_tpu.models.layers import Attention, GroupNorm
from controlanimate_tpu.ops.attention import reference_attention
from controlanimate_tpu.weights.ingest import conv_kernel, dense_kernel


def test_groupnorm_matches_torch():
    rs = np.random.RandomState(0)
    x = rs.randn(2, 6, 5, 16).astype(np.float32)  # NHWC
    w = rs.randn(16).astype(np.float32)
    b = rs.randn(16).astype(np.float32)

    gn = GroupNorm(num_groups=4)
    out = gn.apply({"params": {"scale": w, "bias": b}}, jnp.asarray(x))

    tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    tout = torch.nn.functional.group_norm(tx, 4, torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(tout.numpy(), (0, 2, 3, 1)), atol=1e-5
    )


def test_conv_kernel_layout_matches_torch():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 9, 9, 3).astype(np.float32)
    w = rs.randn(8, 3, 3, 3).astype(np.float32)  # OIHW
    bias = rs.randn(8).astype(np.float32)

    from flax import linen as nn

    conv = nn.Conv(8, (3, 3), padding=1)
    out = conv.apply(
        {"params": {"kernel": conv_kernel(w), "bias": bias}}, jnp.asarray(x)
    )
    tout = torch.nn.functional.conv2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(w),
        torch.from_numpy(bias),
        padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(tout.numpy(), (0, 2, 3, 1)), atol=1e-4
    )


def test_attention_matches_torch_sdpa():
    rs = np.random.RandomState(2)
    B, N, H, D = 2, 10, 4, 8
    q = rs.randn(B, N, H, D).astype(np.float32)
    k = rs.randn(B, N, H, D).astype(np.float32)
    v = rs.randn(B, N, H, D).astype(np.float32)
    out = reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    tout = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(np.transpose(q, (0, 2, 1, 3))),
        torch.from_numpy(np.transpose(k, (0, 2, 1, 3))),
        torch.from_numpy(np.transpose(v, (0, 2, 1, 3))),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(tout.numpy(), (0, 2, 1, 3)), atol=1e-5
    )


def test_ip_dual_stream_attention_matches_two_pass():
    """Dual-stream == text-only attention + scale * image-token attention
    (the reference computes two SDPA calls and adds,
    attention_processor.py:429-477)."""
    rs = np.random.RandomState(3)
    B, N, C, L, IP = 1, 6, 32, 9, 4
    x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    ctx = jnp.asarray(rs.randn(B, L + IP, C).astype(np.float32))

    attn_ip = Attention(C, heads=4, dim_head=8, cross_attention_dim=C, ip_tokens=IP)
    params = attn_ip.init(jax.random.PRNGKey(0), x, ctx)["params"]
    out = attn_ip.apply({"params": params}, x, ctx, ip_scale=0.7)

    # manual two-pass with the same projections
    import flax.linen as nn

    def dense(p, y):
        return y @ p["kernel"]

    q = dense(params["to_q"], x).reshape(B, N, 4, 8)
    ctx_t, ctx_i = ctx[:, :L], ctx[:, L:]
    kt = dense(params["to_k"], ctx_t).reshape(B, L, 4, 8)
    vt = dense(params["to_v"], ctx_t).reshape(B, L, 4, 8)
    ki = dense(params["to_k_ip"], ctx_i).reshape(B, IP, 4, 8)
    vi = dense(params["to_v_ip"], ctx_i).reshape(B, IP, 4, 8)
    two_pass = reference_attention(q, kt, vt) + 0.7 * reference_attention(q, ki, vi)
    expected = dense(params["to_out_0"], two_pass.reshape(B, N, C)) + params["to_out_0"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)
