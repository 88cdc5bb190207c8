"""AutoencoderKL (SD1.5 VAE) in Flax, channels-last.

Capability parity with the VAE the reference loads from the SD snapshot or a
single-file checkpoint (reference: modules/controlanimate_pipeline.py:37-40)
and uses per-frame for latent encode/decode (reference:
animatediff/pipelines/controlanimation_pipeline.py:501-514,565-588 — which
decodes one frame at a time in a Python loop; here encode/decode are jitted
over the whole frame batch).

Architecture contract (SD1.5 `vae/config.json`): block_out (128,256,512,512),
2 encoder resnets + 3 decoder resnets per block, mid attn at 512ch,
latent_channels=4, scaling_factor 0.18215.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import GroupNorm
from ..ops.attention import dot_product_attention, _on_tpu
from ..ops import conv_kernel as ck
from ..ops.upsample import upsample2x_conv3x3


class _GNParams(nn.Module):
    """GroupNorm scale/bias with the same param tree as the GroupNorm module
    (so the fused-conv path can fold the norm without applying it)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class _ConvParams(nn.Module):
    """3x3 conv kernel/bias with the same param tree as nn.Conv."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


def _fusable(x, cout: int) -> bool:
    _, H, W, Cin = x.shape
    return ck.conv_kernel_enabled() and ck._supported(H, W, Cin, cout)


def _gn_silu_conv(x, gn_params, conv_params, groups, dtype, residual=None):
    """GroupNorm -> SiLU -> conv3x3 [+ residual]: one Pallas kernel on TPU
    when enabled/aligned, else the XLA oracle path (identical numerics)."""
    scale, bias = gn_params
    kernel, cbias = conv_params
    # diffusers' VAE hardcodes norm eps=1e-6 (Encoder/Decoder ResnetBlock2D)
    affine = ck.groupnorm_fold(x, scale, bias, groups, eps=1e-6)
    if _fusable(x, kernel.shape[-1]):
        return ck.conv3x3_fused(
            x, kernel.astype(dtype), cbias, affine=affine, act="silu",
            residual=residual, interpret=not _on_tpu(),
        )
    return ck.conv3x3_xla(
        x, kernel.astype(dtype), cbias, affine=affine, act="silu", residual=residual
    )


class VaeResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        in_ch = x.shape[-1]
        gn1 = _GNParams(in_ch, name="norm1")()
        cv1 = _ConvParams(in_ch, self.out_channels, name="conv1")()
        gn2 = _GNParams(self.out_channels, name="norm2")()
        cv2 = _ConvParams(self.out_channels, self.out_channels, name="conv2")()
        shortcut = x
        if in_ch != self.out_channels:
            shortcut = nn.Conv(
                self.out_channels, (1, 1), name="conv_shortcut", dtype=self.dtype
            )(x)
        h = _gn_silu_conv(x, gn1, cv1, self.groups, self.dtype)
        return _gn_silu_conv(h, gn2, cv2, self.groups, self.dtype, residual=shortcut)


class VaeAttnBlock(nn.Module):
    """Single-head spatial self-attention at the VAE mid block."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm(self.groups, epsilon=1e-6, name="group_norm")(x).reshape(B, H * W, C)
        q = nn.Dense(C, name="to_q", dtype=self.dtype)(h)
        k = nn.Dense(C, name="to_k", dtype=self.dtype)(h)
        v = nn.Dense(C, name="to_v", dtype=self.dtype)(h)
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(C, name="to_out_0", dtype=self.dtype)(out)
        return x + out.reshape(B, H, W, C)


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # SD VAE uses asymmetric padding (0,1,0,1) with stride 2; expressing
        # it as conv padding (not jnp.pad) avoids materializing a padded
        # copy of the level-0 activation (1 GB at 16f/512px)
        return nn.Conv(
            self.out_channels, (3, 3), strides=2, padding=((0, 1), (0, 1)),
            name="conv", dtype=self.dtype,
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        B, H, W, C = x.shape
        kernel, bias = _ConvParams(C, self.out_channels, name="conv")()
        if ck.conv_kernel_enabled():
            up = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            if _fusable(up, self.out_channels):
                return ck.conv3x3_fused(
                    up, kernel.astype(self.dtype), bias, interpret=not _on_tpu()
                )
        # nearest-2x + conv3x3 folded into one parity-decomposed conv
        # (ops/upsample.py): exact, 4/9 the MACs, no 2x intermediate
        return upsample2x_conv3x3(x, kernel, bias, dtype=self.dtype)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, name="conv_in", dtype=self.dtype)(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = VaeResnetBlock(c, self.groups, name=f"down_{i}_res_{j}", dtype=self.dtype)(h)
            if i < len(ch) - 1:
                h = Downsample2D(c, name=f"down_{i}_downsample", dtype=self.dtype)(h)
        h = VaeResnetBlock(ch[-1], self.groups, name="mid_res_0", dtype=self.dtype)(h)
        h = VaeAttnBlock(self.groups, name="mid_attn", dtype=self.dtype)(h)
        h = VaeResnetBlock(ch[-1], self.groups, name="mid_res_1", dtype=self.dtype)(h)
        h = GroupNorm(self.groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            2 * self.latent_channels, (3, 3), padding=1, name="conv_out", dtype=self.dtype
        )(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = list(reversed(self.block_out_channels))  # (512,512,256,128)
        h = nn.Conv(ch[0], (3, 3), padding=1, name="conv_in", dtype=self.dtype)(z)
        h = VaeResnetBlock(ch[0], self.groups, name="mid_res_0", dtype=self.dtype)(h)
        h = VaeAttnBlock(self.groups, name="mid_attn", dtype=self.dtype)(h)
        h = VaeResnetBlock(ch[0], self.groups, name="mid_res_1", dtype=self.dtype)(h)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = VaeResnetBlock(c, self.groups, name=f"up_{i}_res_{j}", dtype=self.dtype)(h)
            if i < len(ch) - 1:
                h = Upsample2D(c, name=f"up_{i}_upsample", dtype=self.dtype)(h)
        h = GroupNorm(self.groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, name="conv_out", dtype=self.dtype
        )(h)


class AutoencoderKL(nn.Module):
    """KL-VAE with diffusers-compatible quant convs and scaling factor."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    scaling_factor: float = 0.18215
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            block_out_channels=self.block_out_channels,
            latent_channels=self.latent_channels,
            groups=self.groups,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            block_out_channels=self.block_out_channels,
            groups=self.groups,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> (mean, logvar), each (B, H/8, W/8, 4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, key=None):
        """Encode to *scaled* latents. With a key, samples the posterior;
        without, returns the mode (the reference samples with its generator,
        controlanimation_pipeline.py:569-575)."""
        mean, logvar = self.encode_moments(x)
        if key is not None:
            std = jnp.exp(0.5 * logvar)
            mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return mean * self.scaling_factor

    def decode(self, z):
        """Decode *scaled* latents to (B, H, W, 3) in [-1, 1]
        (the /scaling_factor matches reference decode_latents :505)."""
        z = z / self.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key=None):
        z = self.encode(x, key)
        return self.decode(z)
