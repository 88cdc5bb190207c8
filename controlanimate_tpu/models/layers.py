"""Shared Flax building blocks for the SD1.5-family model stack.

TPU-first conventions used across all models in this package:
  * channels-last layouts: images/features are (..., H, W, C); video features
    are (B, F, H, W, C). The reference's torch stack is NCHW / (b c f h w)
    (reference: animatediff/models/resnet.py:12-31) — channels-last is XLA:TPU's
    native conv layout, so no transposes reach the compiled graph.
  * bfloat16 compute with fp32 parameter-sensitive accumulations.
  * no in-place module surgery: attention variants (IP-Adapter dual-stream)
    are config flags, not runtime processor swaps
    (contrast reference: modules/ip_adapter.py:95-134).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (SD convention: flip_sin_to_cos=True,
    freq_shift=0; reference arch consumes diffusers Timesteps)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[..., None] * emb[None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class TimestepEmbedding(nn.Module):
    """2-layer MLP lifting the sinusoidal embedding to the UNet time channel
    count, with optional conditioning projection (LCM guidance embedding,
    reference: time_cond_proj_dim in LCM unet config)."""

    embed_dim: int
    cond_proj_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray, condition: Optional[jnp.ndarray] = None):
        if condition is not None:
            if self.cond_proj_dim is None:
                raise ValueError("timestep condition passed but cond_proj_dim unset")
            sample = sample + nn.Dense(
                sample.shape[-1], use_bias=False, name="cond_proj", dtype=self.dtype
            )(condition.astype(self.dtype))
        h = nn.Dense(self.embed_dim, name="linear_1", dtype=self.dtype)(sample)
        h = nn.silu(h)
        return nn.Dense(self.embed_dim, name="linear_2", dtype=self.dtype)(h)


class GroupNorm(nn.Module):
    """GroupNorm over the trailing channel axis; fp32 statistics regardless of
    compute dtype (bf16-safe normalization). Implemented directly (not via
    nn.GroupNorm) so the param tree is flat: {scale, bias} of shape (C,)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        C = x.shape[-1]
        G = self.num_groups
        assert C % G == 0, f"channels {C} not divisible by groups {G}"
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        N = x.shape[0]
        grouped = x.reshape(N, -1, G, C // G)
        # statistics accumulate in fp32 (fused reductions — no fp32 copy of
        # the activation is materialized); normalization applies in the
        # input dtype, matching the reference's fp16 .half() execution
        # (modules/controlanimate_pipeline.py:108-110)
        mean = jnp.mean(grouped, axis=(1, 3), keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(
            jnp.square(grouped.astype(jnp.float32)), axis=(1, 3), keepdims=True,
            dtype=jnp.float32,
        )
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        w = (scale.reshape(G, C // G) * inv).astype(orig_dtype)
        b = (bias.reshape(G, C // G) - (mean * inv) * scale.reshape(G, C // G)).astype(orig_dtype)
        y = grouped * w + b
        return y.reshape(x.shape)


class LayerNorm32(nn.Module):
    """LayerNorm with fp32 statistics and input-dtype output.

    nn.LayerNorm(dtype=float32) materializes an f32 copy of the activation
    (2x HBM traffic in a bf16 model); here the reductions accumulate in f32
    but the normalize/affine runs in the input dtype — the same policy as
    GroupNorm above, and the bf16 analog of the reference's fp16 .half()
    execution. Param tree matches nn.LayerNorm ({scale, bias})."""

    epsilon: float = 1e-5  # torch LayerNorm default (flax defaults to 1e-6)

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(
            jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True, dtype=jnp.float32
        )
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        a = inv.astype(x.dtype)
        b = (-mean * inv).astype(x.dtype)
        return (x * a + b) * scale.astype(x.dtype) + bias.astype(x.dtype)


class Attention(nn.Module):
    """Multi-head attention with optional IP-Adapter dual-stream cross-attn.

    Replaces the reference's processor-swap machinery
    (reference: modules/attention_processor.py:367-492 IPAttnProcessor2_0):
    when `ip_tokens > 0` and encoder states carry extra image tokens at the
    tail, a second K/V projection attends over them and the result is added
    with a runtime scale.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    out_bias: bool = True
    # zero-init the output projection so a freshly-initialized layer is an
    # identity residual (reference zero-inits attn_temp.to_out,
    # animatediff/models/attention.py:251)
    out_zero_init: bool = False
    ip_tokens: int = 0  # trailing image-prompt tokens in encoder states
    dtype: jnp.dtype = jnp.float32
    upcast_attention: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, N, C)
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        ip_scale: float | jnp.ndarray = 1.0,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states

        ip_ctx = None
        if self.ip_tokens > 0 and encoder_hidden_states is not None:
            # split trailing image tokens (reference splits at
            # seq_len - num_tokens, attention_processor.py:429-435)
            ctx, ip_ctx = (
                ctx[:, : ctx.shape[1] - self.ip_tokens],
                ctx[:, ctx.shape[1] - self.ip_tokens :],
            )

        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype)(hidden_states)
        k = nn.Dense(inner, use_bias=False, name="to_k", dtype=self.dtype)(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v", dtype=self.dtype)(ctx)

        B, N, _ = q.shape
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, k.shape[1], self.heads, self.dim_head)
        v = v.reshape(B, v.shape[1], self.heads, self.dim_head)

        out = dot_product_attention(q, k, v, mask=mask, upcast=self.upcast_attention)

        if ip_ctx is not None:
            k_ip = nn.Dense(inner, use_bias=False, name="to_k_ip", dtype=self.dtype)(ip_ctx)
            v_ip = nn.Dense(inner, use_bias=False, name="to_v_ip", dtype=self.dtype)(ip_ctx)
            k_ip = k_ip.reshape(B, self.ip_tokens, self.heads, self.dim_head)
            v_ip = v_ip.reshape(B, self.ip_tokens, self.heads, self.dim_head)
            ip_out = dot_product_attention(q, k_ip, v_ip, upcast=self.upcast_attention)
            out = out + jnp.asarray(ip_scale, out.dtype) * ip_out

        out = out.reshape(B, N, inner)
        return nn.Dense(
            inner, use_bias=self.out_bias, name="to_out_0", dtype=self.dtype,
            **({"kernel_init": nn.initializers.zeros} if self.out_zero_init else {}),
        )(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj", dtype=self.dtype)(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses F.gelu == exact erf (not tanh approximation)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """Transformer FFN with GEGLU (reference: animatediff/models/attention.py:303-357)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, name="net_0", dtype=self.dtype)(x)
        return nn.Dense(dim, name="net_2", dtype=self.dtype)(h)
