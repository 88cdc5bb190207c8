"""Independent torch mirrors of the flagship models, used as numerics
oracles (VERDICT r2 #1: the UNet3D/VAE had only structural tests).

These are written from the diffusers / AnimateDiff *semantics* (reference:
animatediff/models/unet.py:458-621, unet_blocks.py, motion_module.py,
attention.py, resnet.py; diffusers AutoencoderKL) — torch code, NCHW /
(b c f h w) layouts, module names chosen so ``state_dict()`` produces the
exact diffusers checkpoint key layout that ``weights/unet_weights.py`` and
``weights/vae_weights.py`` ingest. The golden tests push one random state
dict through the converters and assert forward parity between this torch
stack and the Flax stack.

Everything runs fp32 on CPU at tiny config.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# shared primitives
# --------------------------------------------------------------------------


def timesteps_embed(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers Timesteps with flip_sin_to_cos=True, freq_shift=0
    (the SD1.5 UNet convention)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TimestepEmbeddingT(nn.Module):
    def __init__(self, in_dim: int, embed_dim: int, cond_dim: int | None = None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, embed_dim)
        self.linear_2 = nn.Linear(embed_dim, embed_dim)
        if cond_dim:
            self.cond_proj = nn.Linear(cond_dim, in_dim, bias=False)

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        return self.linear_2(F.silu(self.linear_1(sample)))


class InflatedConv3d(nn.Conv2d):
    """2D conv applied per frame on (b c f h w) (reference: resnet.py:12-22)."""

    def forward(self, x):
        b, c, f, h, w = x.shape
        y = super().forward(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        return y.reshape(b, f, y.shape[1], y.shape[2], y.shape[3]).permute(0, 2, 1, 3, 4)


class InflatedGroupNorm(nn.GroupNorm):
    """GroupNorm with per-frame statistics (reference: resnet.py:25-31)."""

    def forward(self, x):
        b, c, f, h, w = x.shape
        y = super().forward(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        return y.reshape(b, f, c, h, w).permute(0, 2, 1, 3, 4)


def _video_norm(groups: int, channels: int, eps: float, inflated: bool):
    if inflated:
        return InflatedGroupNorm(groups, channels, eps=eps)
    # non-inflated: plain GroupNorm on the 5D tensor -> joint frame stats
    return nn.GroupNorm(groups, channels, eps=eps)


class ResnetBlock3DT(nn.Module):
    """reference resnet.py:111-218, 'default' time scale-shift, eps 1e-5."""

    def __init__(self, cin, cout, temb_dim, groups, inflated, eps=1e-5):
        super().__init__()
        self.norm1 = _video_norm(groups, cin, eps, inflated)
        self.conv1 = InflatedConv3d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = _video_norm(groups, cout, eps, inflated)
        self.conv2 = InflatedConv3d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = InflatedConv3d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class CrossAttentionT(nn.Module):
    """diffusers CrossAttention: no q/k/v bias, to_out.0 linear, softmax in
    f32, scale = dim_head**-0.5."""

    def __init__(self, query_dim, heads, dim_head, context_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def attend(self, q, k, v):
        b, n, _ = q.shape
        m = k.shape[1]
        h, d = self.heads, self.dim_head
        q = q.reshape(b, n, h, d).permute(0, 2, 1, 3)
        k = k.reshape(b, m, h, d).permute(0, 2, 1, 3)
        v = v.reshape(b, m, h, d).permute(0, 2, 1, 3)
        logits = torch.einsum("bhnd,bhmd->bhnm", q, k) * (d ** -0.5)
        probs = logits.float().softmax(dim=-1).to(q.dtype)
        out = torch.einsum("bhnm,bhmd->bhnd", probs, v)
        return out.permute(0, 2, 1, 3).reshape(b, n, h * d)

    def forward(self, x, context=None):
        ctx = x if context is None else context
        out = self.attend(self.to_q(x), self.to_k(ctx), self.to_v(ctx))
        return self.to_out[0](out)


class GEGLUT(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact erf, diffusers GEGLU


class FeedForwardT(nn.Module):
    """keys: ff.net.0.proj.*, ff.net.2.* (diffusers FeedForward + dropout slot)."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.ModuleList([GEGLUT(dim, dim * mult), nn.Identity(), nn.Linear(dim * mult, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class BasicTransformerBlockT(nn.Module):
    def __init__(self, dim, heads, dim_head, context_dim, temporal=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttentionT(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttentionT(dim, heads, dim_head, context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForwardT(dim)
        self.temporal = temporal
        if temporal:
            # unet_use_temporal_attention sublayer (reference
            # attention.py:240-251,291-298): frame-axis self attn after the
            # FFN, zero-init out proj
            self.attn_temp = CrossAttentionT(dim, heads, dim_head)
            nn.init.zeros_(self.attn_temp.to_out[0].weight.data)
            self.norm_temp = nn.LayerNorm(dim)

    def forward(self, x, context, video_length=1):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        if self.temporal:
            bf, d, c = x.shape
            b = bf // video_length
            t = x.reshape(b, video_length, d, c).permute(0, 2, 1, 3).reshape(b * d, video_length, c)
            t = self.attn_temp(self.norm_temp(t)) + t
            x = t.reshape(b, d, video_length, c).permute(0, 2, 1, 3).reshape(bf, d, c)
        return x


class Transformer3DModelT(nn.Module):
    """Spatial transformer (reference attention.py:52-167): frames fold into
    the batch, text context repeats per frame; GN eps 1e-6; conv 1x1 projs."""

    def __init__(self, channels, heads, context_dim, groups, depth=1, temporal=False):
        super().__init__()
        dim_head = channels // heads
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlockT(channels, heads, dim_head, context_dim, temporal=temporal)
             for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, x, context):
        b, c, f, h, w = x.shape
        residual = x
        flat = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        hid = self.proj_in(self.norm(flat))
        hid = hid.permute(0, 2, 3, 1).reshape(b * f, h * w, c)
        ctx = context.repeat_interleave(f, dim=0)
        for blk in self.transformer_blocks:
            hid = blk(hid, ctx, video_length=f)
        hid = hid.reshape(b * f, h, w, c).permute(0, 3, 1, 2)
        hid = self.proj_out(hid)
        hid = hid.reshape(b, f, c, h, w).permute(0, 2, 1, 3, 4)
        return hid + residual


class VersatileAttentionT(CrossAttentionT):
    """Frame-axis self attention with sinusoidal PE (reference
    motion_module.py:248-330): (b f) d c -> (b d) f c, PE added post-LN."""

    def __init__(self, dim, heads, max_len, use_pe):
        super().__init__(dim, heads, dim // heads)
        self.use_pe = use_pe
        if use_pe:
            position = torch.arange(max_len)[:, None].float()
            div = torch.exp(torch.arange(0, dim, 2).float() * (-math.log(10000.0) / dim))
            pe = torch.zeros(1, max_len, dim)
            pe[0, :, 0::2] = torch.sin(position * div)
            pe[0, :, 1::2] = torch.cos(position * div)
            self.register_buffer("pe", pe)

    def forward(self, x, video_length=None):
        bf, d, c = x.shape
        f = video_length
        x = x.reshape(bf // f, f, d, c).permute(0, 2, 1, 3).reshape(bf // f * d, f, c)
        if self.use_pe:
            x = x + self.pe[:, :f]
        out = self.attend(self.to_q(x), self.to_k(x), self.to_v(x))
        out = self.to_out[0](out)
        out = out.reshape(bf // f, d, f, c).permute(0, 2, 1, 3).reshape(bf, d, c)
        return out


class TemporalTransformerBlockT(nn.Module):
    def __init__(self, dim, heads, max_len, use_pe, n_blocks=2):
        super().__init__()
        self.attention_blocks = nn.ModuleList(
            [VersatileAttentionT(dim, heads, max_len, use_pe) for _ in range(n_blocks)]
        )
        self.norms = nn.ModuleList([nn.LayerNorm(dim) for _ in range(n_blocks)])
        self.ff = FeedForwardT(dim)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, x, video_length):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length=video_length) + x
        return self.ff(self.ff_norm(x)) + x


class TemporalTransformer3DT(nn.Module):
    """reference motion_module.py:87-160: GN(eps 1e-6) -> linear proj_in ->
    blocks -> linear proj_out -> residual."""

    def __init__(self, channels, heads, max_len, use_pe, groups, num_layers=1):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, channels)
        self.transformer_blocks = nn.ModuleList(
            [TemporalTransformerBlockT(channels, heads, max_len, use_pe) for _ in range(num_layers)]
        )
        self.proj_out = nn.Linear(channels, channels)

    def forward(self, x):
        b, c, f, h, w = x.shape
        flat = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
        residual = flat
        hid = self.norm(flat)
        hid = hid.permute(0, 2, 3, 1).reshape(b * f, h * w, c)
        hid = self.proj_in(hid)
        for blk in self.transformer_blocks:
            hid = blk(hid, video_length=f)
        hid = self.proj_out(hid)
        hid = hid.reshape(b * f, h, w, c).permute(0, 3, 1, 2)
        out = hid + residual
        return out.reshape(b, f, c, h, w).permute(0, 2, 1, 3, 4)


class MotionModuleT(nn.Module):
    """VanillaTemporalModule wrapper (key prefix `temporal_transformer.`,
    zero-initialized proj_out — reference motion_module.py:50-77)."""

    def __init__(self, channels, heads, max_len, use_pe, groups):
        super().__init__()
        self.temporal_transformer = TemporalTransformer3DT(channels, heads, max_len, use_pe, groups)
        nn.init.zeros_(self.temporal_transformer.proj_out.weight)
        nn.init.zeros_(self.temporal_transformer.proj_out.bias)

    def forward(self, x):
        return self.temporal_transformer(x)


class _Block(nn.Module):
    """Bare container so child ModuleLists get diffusers-style key prefixes."""


# --------------------------------------------------------------------------
# UNet3D
# --------------------------------------------------------------------------


class TorchUNet3D(nn.Module):
    """Inflated SD UNet + AnimateDiff motion modules (reference unet.py:458-621,
    unet_blocks.py:173-762), built from a controlanimate_tpu UNet3DConfig so
    both stacks share one architecture description."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        c0 = cfg.block_out_channels[0]
        temb_dim = c0 * 4
        groups = cfg.norm_num_groups
        inflated = cfg.use_inflated_groupnorm
        m = cfg.motion
        self.conv_in = InflatedConv3d(cfg.in_channels, c0, 3, padding=1)
        self.time_embedding = TimestepEmbeddingT(c0, temb_dim, cfg.time_cond_proj_dim)

        def motion(ch):
            return MotionModuleT(
                ch, m.num_attention_heads, m.temporal_position_encoding_max_len,
                m.temporal_position_encoding, groups,
            )

        skips = [c0]
        self.down_blocks = nn.ModuleList()
        ch = c0
        n_down = len(cfg.down_block_types)
        for i, bt in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            blk = _Block()
            blk.resnets = nn.ModuleList()
            has_cross = bt == "CrossAttnDownBlock3D"
            use_motion = (
                cfg.use_motion_module
                and (2 ** i) in cfg.motion_module_resolutions
                and not cfg.motion_module_decoder_only
            )
            if has_cross:
                blk.attentions = nn.ModuleList()
            if use_motion:
                blk.motion_modules = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(ResnetBlock3DT(ch, out_ch, temb_dim, groups, inflated))
                if has_cross:
                    blk.attentions.append(
                        Transformer3DModelT(out_ch, cfg.attention_heads, cfg.cross_attention_dim, groups,
                                            temporal=getattr(cfg, "temporal_attention", False))
                    )
                if use_motion:
                    blk.motion_modules.append(motion(out_ch))
                skips.append(out_ch)
                ch = out_ch
            if i < n_down - 1:
                ds = _Block()
                ds.conv = InflatedConv3d(out_ch, out_ch, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
                skips.append(out_ch)
            self.down_blocks.append(blk)

        mid = _Block()
        mid.resnets = nn.ModuleList(
            [ResnetBlock3DT(ch, ch, temb_dim, groups, inflated) for _ in range(2)]
        )
        mid.attentions = nn.ModuleList(
            [Transformer3DModelT(ch, cfg.attention_heads, cfg.cross_attention_dim, groups,
                                temporal=getattr(cfg, "temporal_attention", False))]
        )
        if cfg.use_motion_module and cfg.motion_module_mid_block:
            mid.motion_modules = nn.ModuleList([motion(ch)])
        self.mid_block = mid

        self.up_blocks = nn.ModuleList()
        reversed_ch = list(reversed(cfg.block_out_channels))
        for i, bt in enumerate(cfg.up_block_types):
            out_ch = reversed_ch[i]
            blk = _Block()
            blk.resnets = nn.ModuleList()
            has_cross = bt == "CrossAttnUpBlock3D"
            resolution = 2 ** (len(cfg.up_block_types) - 1 - i)
            use_motion = cfg.use_motion_module and resolution in cfg.motion_module_resolutions
            if has_cross:
                blk.attentions = nn.ModuleList()
            if use_motion:
                blk.motion_modules = nn.ModuleList()
            for _ in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                blk.resnets.append(ResnetBlock3DT(ch + skip, out_ch, temb_dim, groups, inflated))
                if has_cross:
                    blk.attentions.append(
                        Transformer3DModelT(out_ch, cfg.attention_heads, cfg.cross_attention_dim, groups,
                                            temporal=getattr(cfg, "temporal_attention", False))
                    )
                if use_motion:
                    blk.motion_modules.append(motion(out_ch))
                ch = out_ch
            if i < len(cfg.up_block_types) - 1:
                us = _Block()
                us.conv = InflatedConv3d(out_ch, out_ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)

        self.conv_norm_out = _video_norm(groups, c0, 1e-5, inflated)
        self.conv_out = InflatedConv3d(c0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context, timestep_cond=None,
                down_residuals_add=None, mid_residual_add=None):
        """sample: (B, C, F, H, W); timesteps: (B,); context: (B, L, D)."""
        cfg = self.cfg
        temb = self.time_embedding(
            timesteps_embed(timesteps, cfg.block_out_channels[0]), timestep_cond
        )
        sample = self.conv_in(sample)
        residuals = [sample]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", []))
            motions = list(getattr(blk, "motion_modules", []))
            for j, res in enumerate(blk.resnets):
                sample = res(sample, temb)
                if attns:
                    sample = attns[j](sample, context)
                if motions:
                    sample = motions[j](sample)
                residuals.append(sample)
            for ds in getattr(blk, "downsamplers", []):
                sample = ds.conv(sample)
                residuals.append(sample)

        sample = self.mid_block.resnets[0](sample, temb)
        sample = self.mid_block.attentions[0](sample, context)
        for mm in getattr(self.mid_block, "motion_modules", []):
            sample = mm(sample)
        sample = self.mid_block.resnets[1](sample, temb)

        if down_residuals_add is not None:
            residuals = [r + c for r, c in zip(residuals, down_residuals_add)]
        if mid_residual_add is not None:
            sample = sample + mid_residual_add

        for blk in self.up_blocks:
            attns = list(getattr(blk, "attentions", []))
            motions = list(getattr(blk, "motion_modules", []))
            for j, res in enumerate(blk.resnets):
                sample = res(torch.cat([sample, residuals.pop()], dim=1), temb)
                if attns:
                    sample = attns[j](sample, context)
                if motions:
                    sample = motions[j](sample)
            for us in getattr(blk, "upsamplers", []):
                b, c, f, h, w = sample.shape
                flat = sample.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
                flat = F.interpolate(flat, scale_factor=2.0, mode="nearest")
                sample = flat.reshape(b, f, c, h * 2, w * 2).permute(0, 2, 1, 3, 4)
                sample = us.conv(sample)

        sample = self.conv_out(F.silu(self.conv_norm_out(sample)))
        return sample


# --------------------------------------------------------------------------
# VAE (diffusers AutoencoderKL layout; all norms eps 1e-6)
# --------------------------------------------------------------------------


class VaeResnetT(nn.Module):
    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class VaeAttnT(nn.Module):
    """Single-head attention block (diffusers Attention in the VAE mid
    block): GN eps 1e-6, q/k/v/out linears WITH bias, scale = C**-0.5."""

    def __init__(self, channels, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        b, c, h, w = x.shape
        hid = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hid), self.to_k(hid), self.to_v(hid)
        logits = torch.einsum("bnc,bmc->bnm", q, k) * (c ** -0.5)
        probs = logits.float().softmax(dim=-1).to(q.dtype)
        out = self.to_out[0](torch.einsum("bnm,bmc->bnc", probs, v))
        return x + out.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TorchVAE(nn.Module):
    def __init__(self, block_out_channels=(128, 256, 512, 512), latent_channels=4, groups=32):
        super().__init__()
        ch = list(block_out_channels)
        groups = groups

        enc = _Block()
        enc.conv_in = nn.Conv2d(3, ch[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cur = ch[0]
        for i, c in enumerate(ch):
            blk = _Block()
            blk.resnets = nn.ModuleList()
            for _ in range(2):
                blk.resnets.append(VaeResnetT(cur, c, groups))
                cur = c
            if i < len(ch) - 1:
                ds = _Block()
                ds.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)  # asym pad in forward
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
        mid = _Block()
        mid.resnets = nn.ModuleList([VaeResnetT(cur, cur, groups), VaeResnetT(cur, cur, groups)])
        mid.attentions = nn.ModuleList([VaeAttnT(cur, groups)])
        enc.mid_block = mid
        enc.conv_norm_out = nn.GroupNorm(groups, cur, eps=1e-6)
        enc.conv_out = nn.Conv2d(cur, 2 * latent_channels, 3, padding=1)
        self.encoder = enc

        dec = _Block()
        rch = list(reversed(ch))
        dec.conv_in = nn.Conv2d(latent_channels, rch[0], 3, padding=1)
        midd = _Block()
        midd.resnets = nn.ModuleList([VaeResnetT(rch[0], rch[0], groups), VaeResnetT(rch[0], rch[0], groups)])
        midd.attentions = nn.ModuleList([VaeAttnT(rch[0], groups)])
        dec.mid_block = midd
        dec.up_blocks = nn.ModuleList()
        cur = rch[0]
        for i, c in enumerate(rch):
            blk = _Block()
            blk.resnets = nn.ModuleList()
            for _ in range(3):
                blk.resnets.append(VaeResnetT(cur, c, groups))
                cur = c
            if i < len(rch) - 1:
                us = _Block()
                us.conv = nn.Conv2d(c, c, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
        dec.conv_norm_out = nn.GroupNorm(groups, cur, eps=1e-6)
        dec.conv_out = nn.Conv2d(cur, 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        enc = self.encoder
        h = enc.conv_in(x)
        for blk in enc.down_blocks:
            for res in blk.resnets:
                h = res(h)
            for ds in getattr(blk, "downsamplers", []):
                h = ds.conv(F.pad(h, (0, 1, 0, 1)))  # SD VAE asymmetric pad
        h = enc.mid_block.resnets[0](h)
        h = enc.mid_block.attentions[0](h)
        h = enc.mid_block.resnets[1](h)
        h = enc.conv_out(F.silu(enc.conv_norm_out(h)))
        return self.quant_conv(h).chunk(2, dim=1)

    def decode(self, z):
        dec = self.decoder
        h = dec.conv_in(self.post_quant_conv(z))
        h = dec.mid_block.resnets[0](h)
        h = dec.mid_block.attentions[0](h)
        h = dec.mid_block.resnets[1](h)
        for blk in dec.up_blocks:
            for res in blk.resnets:
                h = res(h)
            for us in getattr(blk, "upsamplers", []):
                h = us.conv(F.interpolate(h, scale_factor=2.0, mode="nearest"))
        return dec.conv_out(F.silu(dec.conv_norm_out(h)))


def randomize_(module: nn.Module, seed: int = 0, scale: float = 0.25) -> None:
    """Randomize every parameter (incl. zero-inits) so golden comparisons
    exercise all weights with O(1)-magnitude activations."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)


# --------------------------------------------------------------------------
# ControlNet (diffusers SD1.5 layout; reference loads these models at
# modules/controlresiduals_pipeline.py:30-38)
# --------------------------------------------------------------------------


class CondEmbeddingT(nn.Module):
    def __init__(self, out_channels, block_out=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = InflatedConv3d(3, block_out[0], 3, padding=1)
        blocks = []
        for i in range(len(block_out) - 1):
            blocks.append(InflatedConv3d(block_out[i], block_out[i], 3, padding=1))
            blocks.append(InflatedConv3d(block_out[i], block_out[i + 1], 3, stride=2, padding=1))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = InflatedConv3d(block_out[-1], out_channels, 3, padding=1)

    def forward(self, cond):
        h = F.silu(self.conv_in(cond))
        for b in self.blocks:
            h = F.silu(b(h))
        return self.conv_out(h)


class TorchControlNet(nn.Module):
    """ControlNet = UNet down+mid path + zero-conv heads, per-frame 2D
    (inflated GN == 2D GN per frame)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        c0 = cfg.block_out_channels[0]
        temb_dim = c0 * 4
        groups = cfg.norm_num_groups
        self.conv_in = InflatedConv3d(cfg.in_channels, c0, 3, padding=1)
        self.time_embedding = TimestepEmbeddingT(c0, temb_dim)
        self.controlnet_cond_embedding = CondEmbeddingT(c0)

        self.down_blocks = nn.ModuleList()
        heads = []
        ch = c0
        heads.append(nn.Conv2d(c0, c0, 1))
        n_down = len(cfg.down_block_types)
        for i, bt in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            blk = _Block()
            blk.resnets = nn.ModuleList()
            has_cross = bt.startswith("CrossAttn")
            if has_cross:
                blk.attentions = nn.ModuleList()
            for _ in range(cfg.layers_per_block):
                blk.resnets.append(ResnetBlock3DT(ch, out_ch, temb_dim, groups, True))
                if has_cross:
                    blk.attentions.append(
                        Transformer3DModelT(out_ch, cfg.attention_heads, cfg.cross_attention_dim, groups)
                    )
                heads.append(nn.Conv2d(out_ch, out_ch, 1))
                ch = out_ch
            if i < n_down - 1:
                ds = _Block()
                ds.conv = InflatedConv3d(out_ch, out_ch, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
                heads.append(nn.Conv2d(out_ch, out_ch, 1))
            self.down_blocks.append(blk)
        self.controlnet_down_blocks = nn.ModuleList(heads)

        mid = _Block()
        mid.resnets = nn.ModuleList(
            [ResnetBlock3DT(ch, ch, temb_dim, groups, True) for _ in range(2)]
        )
        mid.attentions = nn.ModuleList(
            [Transformer3DModelT(ch, cfg.attention_heads, cfg.cross_attention_dim, groups)]
        )
        self.mid_block = mid
        self.controlnet_mid_block = nn.Conv2d(ch, ch, 1)

    def _head(self, conv, x):
        b, c, f, h, w = x.shape
        y = conv(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        return y.reshape(b, f, *y.shape[1:]).permute(0, 2, 1, 3, 4)

    def forward(self, sample, timesteps, context, cond, conditioning_scale=1.0,
                guess_mode=False):
        cfg = self.cfg
        temb = self.time_embedding(timesteps_embed(timesteps, cfg.block_out_channels[0]))
        sample = self.conv_in(sample) + self.controlnet_cond_embedding(cond)
        residuals = [sample]
        for blk in self.down_blocks:
            attns = list(getattr(blk, "attentions", []))
            for j, res in enumerate(blk.resnets):
                sample = res(sample, temb)
                if attns:
                    sample = attns[j](sample, context)
                residuals.append(sample)
            for ds in getattr(blk, "downsamplers", []):
                sample = ds.conv(sample)
                residuals.append(sample)
        sample = self.mid_block.resnets[0](sample, temb)
        sample = self.mid_block.attentions[0](sample, context)
        sample = self.mid_block.resnets[1](sample, temb)

        outs = [self._head(conv, r) for conv, r in zip(self.controlnet_down_blocks, residuals)]
        mid = self._head(self.controlnet_mid_block, sample)
        if guess_mode:
            import numpy as _np

            scales = _np.logspace(-1, 0, len(outs) + 1)
            outs = [o * float(s) for o, s in zip(outs, scales[:-1])]
            mid = mid * float(scales[-1])
        outs = [o * conditioning_scale for o in outs]
        return outs, mid * conditioning_scale
