"""Pseudo-3D UNet primitives, channels-last.

Behavioral parity with the reference's inflated primitives
(reference: animatediff/models/resnet.py): 2D convs applied per frame,
group-norm either per-frame ("inflated", v2 config) or with frame-joint
statistics, nearest ×2 upsampling on (H, W) only.

TPU-first: video features are (B, F, H, W, C); per-frame 2D ops fold F into
the batch via reshape — a no-op layout-wise for XLA — instead of the
reference's einops rearrange of NCHW tensors (resnet.py:12-31).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm
from ..ops.upsample import upsample2x_conv3x3


def fold_frames(x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """(B, F, H, W, C) -> (B*F, H, W, C), F."""
    B, F, H, W, C = x.shape
    return x.reshape(B * F, H, W, C), F


def unfold_frames(x: jnp.ndarray, f: int) -> jnp.ndarray:
    BF, H, W, C = x.shape
    return x.reshape(BF // f, f, H, W, C)


class InflatedConv(nn.Module):
    """2D conv applied independently per frame (reference: InflatedConv3d,
    resnet.py:12-22)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: int = 1
    padding: int | str = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        flat, f = fold_frames(x)
        out = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            name="conv",
            dtype=self.dtype,
        )(flat)
        return unfold_frames(out, f)


class VideoGroupNorm(nn.Module):
    """GroupNorm for (B, F, H, W, C).

    inflated=True  -> statistics per frame (reference: InflatedGroupNorm,
                      resnet.py:25-31; v2 inference config)
    inflated=False -> statistics joint over frames (torch GroupNorm on
                      (b c f h w), the v1 behavior)
    """

    num_groups: int = 32
    inflated: bool = True
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        if self.inflated:
            flat = x.reshape(B * F, H, W, C)
            out = GroupNorm(self.num_groups, epsilon=self.epsilon, name="norm")(flat)
            return out.reshape(B, F, H, W, C)
        # joint statistics: treat (F, H, W) all as spatial axes
        flat = x.reshape(B, F * H * W, C)
        out = GroupNorm(self.num_groups, epsilon=self.epsilon, name="norm")(flat)
        return out.reshape(B, F, H, W, C)


class ResnetBlock3D(nn.Module):
    """Resnet block with time-embedding injection
    (reference: resnet.py:111-218; 'default' additive time-scale-shift)."""

    out_channels: int
    use_inflated_groupnorm: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        in_ch = x.shape[-1]
        h = VideoGroupNorm(self.groups, self.use_inflated_groupnorm, self.eps, name="norm1")(x)
        h = nn.silu(h)
        h = InflatedConv(self.out_channels, name="conv1", dtype=self.dtype)(h)

        # temb: (B, time_dim) -> per-channel bias
        t = nn.Dense(self.out_channels, name="time_emb_proj", dtype=self.dtype)(nn.silu(temb))
        h = h + t[:, None, None, None, :]

        h = VideoGroupNorm(self.groups, self.use_inflated_groupnorm, self.eps, name="norm2")(h)
        h = nn.silu(h)
        h = InflatedConv(self.out_channels, name="conv2", dtype=self.dtype)(h)

        if in_ch != self.out_channels:
            x = InflatedConv(
                self.out_channels, kernel=(1, 1), padding=0, name="conv_shortcut", dtype=self.dtype
            )(x)
        return x + h


class Downsample3D(nn.Module):
    """Strided conv downsample on (H, W) (reference: resnet.py:85-108)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return InflatedConv(
            self.out_channels, strides=2, padding=1, name="conv", dtype=self.dtype
        )(x)


class Upsample3D(nn.Module):
    """Nearest ×2 upsample on (H, W) only, then conv (reference: resnet.py:34-82)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, H, W, C = x.shape
        # nearest-2x + conv3x3 folded into one parity-decomposed conv
        # (ops/upsample.py): exact, 4/9 the MACs, no 2x intermediate.
        # (Nearest resize is dtype-invariant, so no f32 round trip either
        # — the reference upcasts only because torch bf16 interpolate was
        # unsupported, :59-63.)
        class _Conv(nn.Module):
            in_features: int
            features: int

            @nn.compact
            def __call__(self):
                kernel = self.param(
                    "kernel", nn.initializers.lecun_normal(),
                    (3, 3, self.in_features, self.features), jnp.float32,
                )
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,), jnp.float32
                )
                return kernel, bias

        class _ConvScope(nn.Module):
            in_features: int
            features: int

            @nn.compact
            def __call__(self):
                return _Conv(self.in_features, self.features, name="conv")()

        kernel, bias = _ConvScope(C, self.out_channels, name="conv")()
        flat = x.reshape(B * F, H, W, C)
        out = upsample2x_conv3x3(flat, kernel, bias, dtype=self.dtype)
        return out.reshape(B, F, H * 2, W * 2, self.out_channels)
