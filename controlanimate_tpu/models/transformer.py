"""Spatial transformer (per-frame attention over H·W tokens).

Behavioral parity with the reference's Transformer3DModel /
BasicTransformerBlock (reference: animatediff/models/attention.py:52-300):
frames fold into the batch, text context repeats per frame, blocks run
self-attn -> cross-attn(text [+ IP image tokens]) -> GEGLU feed-forward.

The IP-Adapter dual-stream path is a construction-time flag on the cross
attention (ip_tokens=4) instead of the reference's runtime processor swap
(modules/ip_adapter.py:95-119).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm32, Attention, FeedForward, GroupNorm
from .resnet3d import fold_frames, unfold_frames


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    cross_attention_dim: int = 768
    ip_tokens: int = 0
    upcast_attention: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_scale=1.0):
        dim = x.shape[-1]
        h = LayerNorm32(name="norm1")(x)
        x = x + Attention(
            dim, self.heads, self.dim_head, name="attn1",
            upcast_attention=self.upcast_attention, dtype=self.dtype,
        )(h)
        h = LayerNorm32(name="norm2")(x)
        x = x + Attention(
            dim, self.heads, self.dim_head,
            cross_attention_dim=self.cross_attention_dim,
            ip_tokens=self.ip_tokens,
            name="attn2",
            upcast_attention=self.upcast_attention,
            dtype=self.dtype,
        )(h, encoder_hidden_states=context, ip_scale=ip_scale)
        h = LayerNorm32(name="norm3")(x)
        return x + FeedForward(name="ff", dtype=self.dtype)(h)


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 conv proj_in -> N transformer blocks -> proj_out,
    residual (SD1.5: use_linear_projection=False, depth=1)."""

    heads: int
    dim_head: int
    depth: int = 1
    cross_attention_dim: int = 768
    ip_tokens: int = 0
    upcast_attention: bool = False
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_scale=1.0):
        """x: (B, F, H, W, C); context: (B, L, D) text (+image) embeds."""
        B, F, H, W, C = x.shape
        inner = self.heads * self.dim_head
        residual = x

        h, f = fold_frames(x)
        h = GroupNorm(self.groups, epsilon=1e-6, name="norm")(h)
        h = nn.Conv(inner, (1, 1), name="proj_in", dtype=self.dtype)(h)
        h = h.reshape(B * F, H * W, inner)

        # repeat context per frame (reference: attention.py:124-125)
        ctx = jnp.repeat(context, F, axis=0)

        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.heads,
                self.dim_head,
                self.cross_attention_dim,
                ip_tokens=self.ip_tokens,
                upcast_attention=self.upcast_attention,
                name=f"transformer_blocks_{i}",
                dtype=self.dtype,
            )(h, ctx, ip_scale=ip_scale)

        h = h.reshape(B * F, H, W, inner)
        h = nn.Conv(C, (1, 1), name="proj_out", dtype=self.dtype)(h)
        return unfold_frames(h, f) + residual
