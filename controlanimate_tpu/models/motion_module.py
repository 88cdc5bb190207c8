"""AnimateDiff temporal motion module.

Behavioral parity with the reference's VanillaTemporalModule stack
(reference: animatediff/models/motion_module.py): a temporal transformer
whose attention runs **across frames at each spatial location** —
(B, F, H, W, C) -> (B·H·W, F, C) — with sinusoidal positional encoding over
the frame axis (max_len 24 v1 / 32 v2, :227-245) and a zero-initialized
output projection so a freshly-initialized module is an identity residual
(:50-77), which is what makes non-strict 2D weight loading sound.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Attention, FeedForward, GroupNorm


def temporal_positional_encoding(max_len: int, dim: int) -> np.ndarray:
    """Standard sinusoidal PE table (reference: motion_module.py:227-245)."""
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, dim, 2).astype(np.float64) * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class TemporalAttentionBlock(nn.Module):
    """One 'Temporal_Self' attention sublayer with frame-axis PE."""

    heads: int
    max_len: int = 32
    use_pos_encoding: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, F, C) where N = B*H*W."""
        N, F, C = x.shape
        h = nn.LayerNorm(name="norm", dtype=jnp.float32)(x)
        if self.use_pos_encoding:
            pe = temporal_positional_encoding(self.max_len, C)[:F]
            h = h + jnp.asarray(pe, h.dtype)[None]
        return x + Attention(
            C, self.heads, C // self.heads, name="attention", dtype=self.dtype
        )(h)


class TemporalTransformerBlock(nn.Module):
    heads: int
    attention_block_types: Sequence[str] = ("Temporal_Self", "Temporal_Self")
    max_len: int = 32
    use_pos_encoding: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, block_type in enumerate(self.attention_block_types):
            if block_type != "Temporal_Self":
                raise NotImplementedError(
                    f"attention block type {block_type!r}; the reference's shipped "
                    "configs use Temporal_Self only (inference-v{1,2}.yaml)"
                )
            x = TemporalAttentionBlock(
                self.heads,
                self.max_len,
                self.use_pos_encoding,
                name=f"attention_blocks_{i}",
                dtype=self.dtype,
            )(x)
        h = nn.LayerNorm(name="norm", dtype=jnp.float32)(x)
        return x + FeedForward(name="ff", dtype=self.dtype)(h)


class MotionModule(nn.Module):
    """VanillaTemporalModule + TemporalTransformer3DModel fused
    (reference: motion_module.py:50-160)."""

    heads: int = 8
    num_transformer_block: int = 1
    attention_block_types: Sequence[str] = ("Temporal_Self", "Temporal_Self")
    max_len: int = 32
    use_pos_encoding: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, F, H, W, C) -> same, residual."""
        B, F, H, W, C = x.shape
        residual = x

        h = x.reshape(B, F, H * W, C)
        # per-frame GroupNorm over channels (reference norms (b c f h w) with
        # GroupNorm32 across f jointly via InflatedGroupNorm-equivalent;
        # TemporalTransformer3DModel.norm is a plain GroupNorm over c)
        h = h.reshape(B * F, H * W, C)
        h = GroupNorm(self.groups, name="norm")(h)
        h = nn.Dense(C, name="proj_in", dtype=self.dtype)(h)

        # (B*F, HW, C) -> (B*HW, F, C): attention across frames per location
        h = h.reshape(B, F, H * W, C).transpose(0, 2, 1, 3).reshape(B * H * W, F, C)

        for i in range(self.num_transformer_block):
            h = TemporalTransformerBlock(
                self.heads,
                self.attention_block_types,
                self.max_len,
                self.use_pos_encoding,
                name=f"transformer_blocks_{i}",
                dtype=self.dtype,
            )(h)

        h = h.reshape(B, H * W, F, C).transpose(0, 2, 1, 3)  # (B, F, HW, C)
        # zero-init output projection: identity residual at init
        h = nn.Dense(
            C, name="proj_out", kernel_init=nn.initializers.zeros, dtype=self.dtype
        )(h)
        return residual + h.reshape(B, F, H, W, C)
