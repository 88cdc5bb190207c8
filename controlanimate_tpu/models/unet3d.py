"""UNet3DConditionModel: SD1.5 UNet inflated to video with AnimateDiff
motion modules — Flax, channels-last, functional.

Behavioral parity with the reference's model stack
(reference: animatediff/models/unet.py:50-621, unet_blocks.py): per layer the
interleaving is ResnetBlock3D -> SpatialTransformer -> MotionModule
(unet_blocks.py:409-413), ControlNet residuals are added to the down skips
and mid output (unet.py:567-576,583-585), and the LCM guidance embedding
enters through the time-embedding cond projection (unet.py:534; LCM unet
config time_cond_proj_dim=256).

Differences by design (TPU-first):
  * (B, F, H, W, C) channels-last layout; frames fold into the batch for all
    2D ops so XLA sees large static-batch convs for the MXU.
  * IP-Adapter dual-stream cross-attention is a constructor flag
    (`ip_tokens`), not a runtime attn-processor swap.
  * No in-place attention slicing machinery (unet.py:389-452) — XLA/Pallas
    attention handles memory.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..config import ArchConfig, MotionModuleConfig
from .layers import TimestepEmbedding, timestep_embedding
from .motion_module import MotionModule
from .resnet3d import Downsample3D, InflatedConv, ResnetBlock3D, Upsample3D, VideoGroupNorm
from .transformer import SpatialTransformer


@dataclass(frozen=True)
class UNet3DConfig:
    """Static architecture config (SD1.5 defaults; reference:
    models/LCM_Dreamshaper_v7/unet/config.json + inference-v2.yaml)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    down_block_types: tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    up_block_types: tuple[str, ...] = (
        "UpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
    )
    attention_heads: int = 8  # SD1.5 'attention_head_dim: 8' == 8 heads
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    time_cond_proj_dim: Optional[int] = None  # 256 for native-LCM UNets
    upcast_attention: bool = False
    # inflation / motion config
    use_motion_module: bool = True
    use_inflated_groupnorm: bool = True
    motion_module_resolutions: tuple[int, ...] = (1, 2, 4, 8)
    motion_module_mid_block: bool = True
    motion_module_decoder_only: bool = False
    motion: MotionModuleConfig = field(default_factory=MotionModuleConfig)
    # IP-Adapter dual-stream tokens in cross attention (0 = off)
    ip_tokens: int = 0
    # sparse-causal cross-frame attention in attn1 (AnimateDiff-v1 lineage
    # flag `unet_use_cross_frame_attention`; the reference's branch is dead
    # code — see models/transformer.py docstring)
    cross_frame_attention: bool = False
    # extra frame-axis attn sublayer after each spatial block's FFN
    # (`unet_use_temporal_attention`, reference attention.py:240-251)
    temporal_attention: bool = False
    # ToMe-SD token merging on spatial self-attention (opt-in approximation,
    # RunConfig.token_merge_ratio -> facade bakes it here; 0 = exact/off)
    token_merge_ratio: float = 0.0
    token_merge_min_tokens: int = 4096
    # extend the merge to the motion modules' token axis (beyond ToMe-SD;
    # RunConfig.token_merge_motion — needs token_merge_ratio > 0)
    token_merge_motion: bool = False

    @staticmethod
    def from_arch(
        arch: ArchConfig,
        unet_json: Optional[dict] = None,
        ip_tokens: int = 0,
    ) -> "UNet3DConfig":
        """Combine a diffusers unet config.json with the AnimateDiff
        inference yaml (reference: unet.py from_pretrained_2d:634-650)."""
        j = unet_json or {}
        return UNet3DConfig(
            in_channels=j.get("in_channels", 4),
            out_channels=j.get("out_channels", 4),
            block_out_channels=tuple(j.get("block_out_channels", (320, 640, 1280, 1280))),
            layers_per_block=j.get("layers_per_block", 2),
            attention_heads=j.get("attention_head_dim", 8),
            cross_attention_dim=j.get("cross_attention_dim", 768),
            norm_num_groups=j.get("norm_num_groups", 32),
            time_cond_proj_dim=j.get("time_cond_proj_dim"),
            upcast_attention=bool(j.get("upcast_attention") or False),
            use_motion_module=arch.use_motion_module,
            use_inflated_groupnorm=arch.use_inflated_groupnorm,
            motion_module_resolutions=arch.motion_module_resolutions,
            motion_module_mid_block=arch.motion_module_mid_block,
            motion_module_decoder_only=arch.motion_module_decoder_only,
            motion=arch.motion_module,
            ip_tokens=ip_tokens,
            cross_frame_attention=arch.unet_use_cross_frame_attention,
            temporal_attention=arch.unet_use_temporal_attention,
        )


class UNet3DConditionModel(nn.Module):
    config: UNet3DConfig = field(default_factory=UNet3DConfig)
    dtype: jnp.dtype = jnp.float32

    def _motion(self, name: str):
        m = self.config.motion
        return MotionModule(
            heads=m.num_attention_heads,
            num_transformer_block=m.num_transformer_block,
            attention_block_types=m.attention_block_types,
            max_len=m.temporal_position_encoding_max_len,
            use_pos_encoding=m.temporal_position_encoding,
            groups=self.config.norm_num_groups,
            name=name,
            dtype=self.dtype,
            band=m.attention_band,
            tome_ratio=(
                self.config.token_merge_ratio
                if self.config.token_merge_motion else 0.0
            ),
            tome_min_tokens=self.config.token_merge_min_tokens,
        )

    def _spatial(self, ch: int, name: str):
        cfg = self.config
        return SpatialTransformer(
            heads=cfg.attention_heads,
            dim_head=ch // cfg.attention_heads,
            cross_attention_dim=cfg.cross_attention_dim,
            ip_tokens=cfg.ip_tokens,
            upcast_attention=cfg.upcast_attention,
            cross_frame=cfg.cross_frame_attention,
            temporal_attention=cfg.temporal_attention,
            tome_ratio=cfg.token_merge_ratio,
            tome_min_tokens=cfg.token_merge_min_tokens,
            groups=cfg.norm_num_groups,
            name=name,
            dtype=self.dtype,
        )

    def _resnet(self, ch: int, name: str):
        cfg = self.config
        return ResnetBlock3D(
            ch,
            use_inflated_groupnorm=cfg.use_inflated_groupnorm,
            groups=cfg.norm_num_groups,
            name=name,
            dtype=self.dtype,
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, F, H, W, C_in) latents
        timesteps: jnp.ndarray,  # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B, L, D) text (+IP) embeds
        timestep_cond: Optional[jnp.ndarray] = None,  # (B, cond_dim) LCM w-emb
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        ip_scale: float | jnp.ndarray = 1.0,
        encoder_cache: Optional[tuple] = None,
        return_encoder_features: bool = False,
    ) -> jnp.ndarray:
        """Forward denoise step.

        Encoder propagation (opt-in acceleration, "Faster Diffusion"
        arXiv:2312.09608): `return_encoder_features=True` additionally
        returns `(down_residuals, mid_sample)` captured AFTER ControlNet
        injection; passing that tuple back as `encoder_cache` skips conv_in,
        every down block, the mid block, and the residual injection — only
        the time embedding and the up blocks run against the cached
        features. Used by the engine at non-key sampler steps, where
        adjacent-step encoder features are nearly identical. Exact contract:
        a cached call at the SAME timestep reproduces the full call
        bit-for-bit (tests/test_unet3d.py)."""
        cfg = self.config
        B = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (B,))

        # time embedding (reference: unet.py:519-537)
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        t_emb = t_emb.astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4,
            cond_proj_dim=cfg.time_cond_proj_dim,
            name="time_embedding",
            dtype=self.dtype,
        )(t_emb, timestep_cond)

        if encoder_cache is not None:
            # the cache is POST-injection: fresh ControlNet residuals cannot
            # be combined with cached features — reject loudly rather than
            # silently dropping the conditioning
            if (down_block_additional_residuals is not None
                    or mid_block_additional_residual is not None):
                raise ValueError(
                    "encoder_cache already contains the ControlNet injection; "
                    "pass residuals only on full (cache-producing) steps"
                )
            down_residuals = list(encoder_cache[0])
            sample = encoder_cache[1]
        else:
            sample = InflatedConv(
                cfg.block_out_channels[0], name="conv_in", dtype=self.dtype
            )(sample)

            down_residuals = [sample]
            # ---- down blocks (reference: unet_blocks.py:283-523) ----
            ch = cfg.block_out_channels[0]
            for i, block_type in enumerate(cfg.down_block_types):
                out_ch = cfg.block_out_channels[i]
                has_cross = block_type == "CrossAttnDownBlock3D"
                use_motion = (
                    cfg.use_motion_module
                    and (2**i) in cfg.motion_module_resolutions
                    and not cfg.motion_module_decoder_only
                )
                for j in range(cfg.layers_per_block):
                    sample = self._resnet(out_ch, f"down_blocks_{i}_resnets_{j}")(sample, temb)
                    if has_cross:
                        sample = self._spatial(out_ch, f"down_blocks_{i}_attentions_{j}")(
                            sample, encoder_hidden_states, ip_scale
                        )
                    if use_motion:
                        sample = self._motion(f"down_blocks_{i}_motion_modules_{j}")(sample)
                    down_residuals.append(sample)
                if i < len(cfg.down_block_types) - 1:
                    sample = Downsample3D(out_ch, name=f"down_blocks_{i}_downsamplers_0", dtype=self.dtype)(
                        sample
                    )
                    down_residuals.append(sample)
                ch = out_ch

            # ---- mid block (reference: unet_blocks.py:173-280) ----
            sample = self._resnet(ch, "mid_block_resnets_0")(sample, temb)
            sample = self._spatial(ch, "mid_block_attentions_0")(
                sample, encoder_hidden_states, ip_scale
            )
            if cfg.use_motion_module and cfg.motion_module_mid_block:
                sample = self._motion("mid_block_motion_modules_0")(sample)
            sample = self._resnet(ch, "mid_block_resnets_1")(sample, temb)

            # ControlNet residual injection (reference: unet.py:567-576,583-585)
            if down_block_additional_residuals is not None:
                down_residuals = [
                    r + c.astype(r.dtype)
                    for r, c in zip(down_residuals, down_block_additional_residuals)
                ]
            if mid_block_additional_residual is not None:
                sample = sample + mid_block_additional_residual.astype(sample.dtype)

        encoder_features = (
            (tuple(down_residuals), sample) if return_encoder_features else None
        )

        # ---- up blocks (reference: unet_blocks.py:526-762) ----
        reversed_ch = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            out_ch = reversed_ch[i]
            has_cross = block_type == "CrossAttnUpBlock3D"
            resolution = 2 ** (len(cfg.up_block_types) - 1 - i)
            use_motion = cfg.use_motion_module and resolution in cfg.motion_module_resolutions
            for j in range(cfg.layers_per_block + 1):
                skip = down_residuals.pop()
                sample = jnp.concatenate([sample, skip.astype(sample.dtype)], axis=-1)
                sample = self._resnet(out_ch, f"up_blocks_{i}_resnets_{j}")(sample, temb)
                if has_cross:
                    sample = self._spatial(out_ch, f"up_blocks_{i}_attentions_{j}")(
                        sample, encoder_hidden_states, ip_scale
                    )
                if use_motion:
                    sample = self._motion(f"up_blocks_{i}_motion_modules_{j}")(sample)
            if i < len(cfg.up_block_types) - 1:
                sample = Upsample3D(out_ch, name=f"up_blocks_{i}_upsamplers_0", dtype=self.dtype)(
                    sample
                )

        # ---- out head ----
        sample = VideoGroupNorm(
            cfg.norm_num_groups, cfg.use_inflated_groupnorm, name="conv_norm_out"
        )(sample)
        sample = nn.silu(sample)
        sample = InflatedConv(cfg.out_channels, name="conv_out", dtype=self.dtype)(sample)
        if return_encoder_features:
            return sample, encoder_features
        return sample
