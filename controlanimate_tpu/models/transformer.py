"""Spatial transformer (per-frame attention over H·W tokens).

Behavioral parity with the reference's Transformer3DModel /
BasicTransformerBlock (reference: animatediff/models/attention.py:52-300):
frames fold into the batch, text context repeats per frame, blocks run
self-attn -> cross-attn(text [+ IP image tokens]) -> GEGLU feed-forward.

The IP-Adapter dual-stream path is a construction-time flag on the cross
attention (ip_tokens=4) instead of the reference's runtime processor swap
(modules/ip_adapter.py:95-119).

Sparse-causal cross-frame attention (`cross_frame=True`): attn1 queries the
current frame but keys/values come from [frame 0, frame t-1] concatenated
along the token axis — the Tune-A-Video / AnimateDiff-v1 lineage variant the
reference *declares* but cannot run (its `unet_use_cross_frame_attention`
branch at animatediff/models/attention.py:195-196 instantiates
`SparseCausalAttention2D`, a name never defined anywhere in the repo — a
NameError at construction). Built here for real: the K/V source is gathered
BEFORE the k/v projections (linear per-token maps commute with the gather,
so this is exactly the published post-projection form) which keeps the
projection GEMMs dense and MXU-shaped.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.token_merge import build_merge
from .layers import LayerNorm32, Attention, FeedForward, GroupNorm
from .resnet3d import fold_frames, unfold_frames


def sparse_causal_kv(h: jnp.ndarray, frames: int) -> jnp.ndarray:
    """K/V token source for sparse-causal attention.

    h: (B*F, N, C) folded per-frame tokens -> (B*F, 2N, C) where each frame's
    key/value tokens are [frame 0 tokens, frame t-1 tokens] (frame 0 uses
    itself twice — softmax over duplicated keys with duplicated values is
    exactly plain self-attention, so frame 0 is unchanged).
    """
    BF, N, C = h.shape
    B = BF // frames
    h4 = h.reshape(B, frames, N, C)
    first = jnp.broadcast_to(h4[:, :1], h4.shape)
    former = jnp.concatenate([h4[:, :1], h4[:, :-1]], axis=1)
    return jnp.concatenate([first, former], axis=2).reshape(BF, 2 * N, C)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    cross_attention_dim: int = 768
    ip_tokens: int = 0
    upcast_attention: bool = False
    cross_frame: bool = False
    temporal_attention: bool = False
    # ToMe-SD token merging on the self-attention (ops/token_merge.py):
    # fraction of tokens removed before attn1 when the grid is at least
    # tome_min_tokens (level-0 only by default). 0 = byte-identical off.
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_scale=1.0, frames=1, hw=None):
        dim = x.shape[-1]
        h = LayerNorm32(name="norm1")(x)
        kv = sparse_causal_kv(h, frames) if (self.cross_frame and frames > 1) else None
        attn1 = Attention(
            dim, self.heads, self.dim_head, name="attn1",
            upcast_attention=self.upcast_attention, dtype=self.dtype,
        )
        use_tome = (
            self.tome_ratio > 0.0
            and kv is None
            and hw is not None
            and x.shape[1] >= self.tome_min_tokens
        )
        if use_tome:
            from ..ops.attention import force_flash

            merge, unmerge, _ = build_merge(x, hw[0], hw[1], self.tome_ratio)
            # the merged (non-power-of-4096) shape flips XLA's attention
            # cost model into materializing the f32 logits to HBM (traced:
            # softmax fusion with no dot at 5.2 ms/call — as slow as the
            # UNMERGED fused form); the flash kernel keeps the chain
            # VMEM-tiled regardless of shape
            with force_flash(True):
                a = attn1(merge(h))
            x = x + unmerge(a)
        else:
            x = x + attn1(h, encoder_hidden_states=kv)
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
        x = x + FeedForward(name="ff", dtype=self.dtype)(h)

        # Optional temp-attn sublayer (`unet_use_temporal_attention`,
        # reference animatediff/models/attention.py:240-251,291-298): after
        # the FFN, self-attention over the FRAME axis per spatial token —
        # (B·F, N, C) -> (B·N, F, C), LN, attn (zero-init out proj so a
        # fresh init is identity), residual. Off in every shipped reference
        # yaml; supported here so v1-style configs that enable it load the
        # model they describe instead of raising.
        if self.temporal_attention:
            BF, N, C = x.shape
            B = BF // frames
            t = x.reshape(B, frames, N, C).transpose(0, 2, 1, 3).reshape(B * N, frames, C)
            h = LayerNorm32(name="norm_temp")(t)
            t = t + Attention(
                dim, self.heads, self.dim_head, name="attn_temp",
                upcast_attention=self.upcast_attention, out_zero_init=True,
                dtype=self.dtype,
            )(h)
            x = t.reshape(B, N, frames, C).transpose(0, 2, 1, 3).reshape(BF, N, C)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> 1x1 conv proj_in -> N transformer blocks -> proj_out,
    residual (SD1.5: use_linear_projection=False, depth=1)."""

    heads: int
    dim_head: int
    depth: int = 1
    cross_attention_dim: int = 768
    ip_tokens: int = 0
    upcast_attention: bool = False
    cross_frame: bool = False
    temporal_attention: bool = False
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096
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
                cross_frame=self.cross_frame,
                temporal_attention=self.temporal_attention,
                tome_ratio=self.tome_ratio,
                tome_min_tokens=self.tome_min_tokens,
                name=f"transformer_blocks_{i}",
                dtype=self.dtype,
            )(h, ctx, ip_scale=ip_scale, frames=F, hw=(H, W))

        h = h.reshape(B * F, H, W, inner)
        h = nn.Conv(C, (1, 1), name="proj_out", dtype=self.dtype)(h)
        return unfold_frames(h, f) + residual
