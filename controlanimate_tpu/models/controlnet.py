"""ControlNet in Flax (SD1.5 layout), applied over video frames.

Capability parity with the reference's Multi-ControlNet conditioning
(reference: modules/controlresiduals_pipeline.py): N ControlNets produce 12
down residuals + 1 mid residual per frame, summed across nets with per-net
conditioning scales, optionally in guess mode (logspace residual scaling).

TPU-first: the reference folds frames into the batch with einops around a 2D
torch model per denoise step (controlresiduals_pipeline.py:287-314); here the
model takes (B, F, H, W, C) directly and reuses the same channels-last blocks
as the UNet (motion modules off), so the residual tensors are produced in the
exact layout the UNet consumes — no rearranges in the step function.
"""

from __future__ import annotations

from dataclasses import field
from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import TimestepEmbedding, timestep_embedding
from .resnet3d import Downsample3D, InflatedConv, ResnetBlock3D
from .transformer import SpatialTransformer
from .unet3d import UNet3DConfig


class ControlNetConditioningEmbedding(nn.Module):
    """Small conv encoder lifting the (B, F, H, W, 3) condition image to the
    latent resolution; final conv zero-initialized (diffusers layout)."""

    conditioning_embedding_channels: int = 320
    block_out_channels: tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        h = InflatedConv(self.block_out_channels[0], name="conv_in", dtype=self.dtype)(cond)
        h = nn.silu(h)
        for i in range(len(self.block_out_channels) - 1):
            h = InflatedConv(
                self.block_out_channels[i], name=f"blocks_{2*i}", dtype=self.dtype
            )(h)
            h = nn.silu(h)
            h = InflatedConv(
                self.block_out_channels[i + 1],
                strides=2,
                name=f"blocks_{2*i+1}",
                dtype=self.dtype,
            )(h)
            h = nn.silu(h)
        return InflatedConv(
            self.conditioning_embedding_channels,
            name="conv_out",
            dtype=self.dtype,
        )(h)


class ControlNetModel(nn.Module):
    """SD1.5 ControlNet: UNet down+mid path with zero-conv output heads."""

    config: UNet3DConfig = field(
        default_factory=lambda: UNet3DConfig(use_motion_module=False)
    )
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, F, H, W, 4) latents
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,  # (B, L, 768) TEXT-ONLY embeds
        controlnet_cond: jnp.ndarray,  # (B, F, Hpx, Wpx, 3) condition image
        conditioning_scale: float | jnp.ndarray = 1.0,
        guess_mode: bool = False,
    ) -> tuple[list[jnp.ndarray], jnp.ndarray]:
        cfg = self.config
        B = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0]).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, name="time_embedding", dtype=self.dtype
        )(t_emb)

        sample = InflatedConv(cfg.block_out_channels[0], name="conv_in", dtype=self.dtype)(
            sample
        )
        cond = ControlNetConditioningEmbedding(
            cfg.block_out_channels[0], name="controlnet_cond_embedding", dtype=self.dtype
        )(controlnet_cond)
        sample = sample + cond

        down_residuals = [sample]
        ch = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            has_cross = block_type.startswith("CrossAttn")
            for j in range(cfg.layers_per_block):
                sample = ResnetBlock3D(
                    out_ch,
                    use_inflated_groupnorm=True,
                    groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}_resnets_{j}",
                    dtype=self.dtype,
                )(sample, temb)
                if has_cross:
                    sample = SpatialTransformer(
                        heads=cfg.attention_heads,
                        dim_head=out_ch // cfg.attention_heads,
                        cross_attention_dim=cfg.cross_attention_dim,
                        groups=cfg.norm_num_groups,
                        name=f"down_blocks_{i}_attentions_{j}",
                        dtype=self.dtype,
                    )(sample, encoder_hidden_states)
                down_residuals.append(sample)
            if i < len(cfg.down_block_types) - 1:
                sample = Downsample3D(
                    out_ch, name=f"down_blocks_{i}_downsamplers_0", dtype=self.dtype
                )(sample)
                down_residuals.append(sample)
            ch = out_ch

        sample = ResnetBlock3D(
            ch, use_inflated_groupnorm=True, groups=cfg.norm_num_groups,
            name="mid_block_resnets_0", dtype=self.dtype,
        )(sample, temb)
        sample = SpatialTransformer(
            heads=cfg.attention_heads,
            dim_head=ch // cfg.attention_heads,
            cross_attention_dim=cfg.cross_attention_dim,
            groups=cfg.norm_num_groups,
            name="mid_block_attentions_0",
            dtype=self.dtype,
        )(sample, encoder_hidden_states)
        sample = ResnetBlock3D(
            ch, use_inflated_groupnorm=True, groups=cfg.norm_num_groups,
            name="mid_block_resnets_1", dtype=self.dtype,
        )(sample, temb)

        # zero-conv heads
        outs = []
        for idx, r in enumerate(down_residuals):
            outs.append(
                InflatedConv(
                    r.shape[-1],
                    kernel=(1, 1),
                    padding=0,
                    name=f"controlnet_down_blocks_{idx}",
                    dtype=self.dtype,
                )(r)
            )
        mid_out = InflatedConv(
            sample.shape[-1], kernel=(1, 1), padding=0,
            name="controlnet_mid_block", dtype=self.dtype,
        )(sample)

        if guess_mode:
            # logspace scaling over the 13 residuals (diffusers guess-mode
            # behavior the reference relies on via MultiControlNetModel)
            scales = jnp.asarray(
                np.logspace(-1, 0, len(outs) + 1), dtype=mid_out.dtype
            )
            outs = [o * s for o, s in zip(outs, scales[:-1])]
            mid_out = mid_out * scales[-1]

        scale = jnp.asarray(conditioning_scale, mid_out.dtype)
        outs = [o * scale for o in outs]
        mid_out = mid_out * scale
        return outs, mid_out


def sum_controlnet_residuals(
    per_net: Sequence[tuple[list[jnp.ndarray], jnp.ndarray]],
) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Sum residuals across ControlNets (reference: diffusers
    MultiControlNetModel semantics used at controlresiduals_pipeline.py:294-302)."""
    downs, mids = zip(*per_net)
    summed_down = [sum(ds[i] for ds in downs) for i in range(len(downs[0]))]
    return summed_down, sum(mids)
