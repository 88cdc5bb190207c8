"""AnimateDiff temporal motion module.

Behavioral parity with the reference's VanillaTemporalModule stack
(reference: animatediff/models/motion_module.py): a temporal transformer
whose attention runs **across frames at each spatial location** —
(B, F, H, W, C) -> (B·H·W, F, C) — with sinusoidal positional encoding over
the frame axis (max_len 24 v1 / 32 v2, :227-245) and a zero-initialized
output projection so a freshly-initialized module is an identity residual
(:50-77), which is what makes non-strict 2D weight loading sound.

TPU execution: a fully-fused Pallas formulation of the whole module
(ops/motion_kernel.py) is available behind CONTROLANIMATE_PALLAS_MOTION=1 —
measured a WASH vs XLA on v5e (205.9 vs 205.3 ms full UNet forward), so
XLA is the default; the param tree is identical in both paths. The XLA
path itself shape-dispatches the frame-axis attention (VPU mul-reduce at
level-0 where the einsum form lowers to 65k tiny GEMMs).
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import _on_tpu, _single_device
from ..ops.conv_kernel import groupnorm_fold
from ..ops.motion_kernel import (
    motion_kernel_enabled,
    motion_module_fused,
    pick_nblk,
)


def temporal_positional_encoding(max_len: int, dim: int) -> np.ndarray:
    """Standard sinusoidal PE table (reference: motion_module.py:227-245)."""
    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(np.arange(0, dim, 2).astype(np.float64) * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class _VecPair(nn.Module):
    """scale/bias parameter pair — the tree of LayerNorm32 and GroupNorm."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """kernel/bias parameter pair — the tree of nn.Dense."""

    in_features: int
    features: int
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", init, (self.in_features, self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return kernel, bias


def _dense(x, kernel, bias, dt):
    """nn.Dense(dtype=dt) semantics."""
    y = x.astype(dt) @ kernel.astype(dt)
    if bias is not None:
        y = y + bias.astype(dt)
    return y


def _layernorm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm32 semantics: f32 statistics, input-dtype normalize."""
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True, dtype=jnp.float32
    )
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = inv.astype(x.dtype)
    b = (-mean * inv).astype(x.dtype)
    return (x * a + b) * scale.astype(x.dtype) + bias.astype(x.dtype)


class TemporalEinsumAttention(nn.Module):
    """Frame-axis attention on (B, F, N, C) without explicit transposes;
    param tree matches the generic Attention module (to_q/to_k/to_v/to_out_0)
    so the motion-module weight mapping is unchanged.

    ``band`` > 0 restricts each frame to keys within ±band frames — the
    banded/sliding-window approximation that attacks the motion module's F²
    term for long windows (VERDICT r3 #3). band >= F-1 covers every pair and
    is EXACTLY full attention (pinned by golden test); the reference has no
    counterpart (its temporal attention is always dense,
    animatediff/models/motion_module.py:248-329), so this is a strictly
    opt-in extension, off by default."""

    heads: int
    dtype: jnp.dtype = jnp.float32
    band: int = 0

    @nn.compact
    def __call__(self, h, return_params: bool = False):
        C = h.shape[-1]
        wq, _ = _DenseParams(C, C, use_bias=False, name="to_q")()
        wk, _ = _DenseParams(C, C, use_bias=False, name="to_k")()
        wv, _ = _DenseParams(C, C, use_bias=False, name="to_v")()
        wo, ob = _DenseParams(C, C, name="to_out_0")()
        if return_params:
            return {"wq": wq, "wk": wk, "wv": wv, "wo": wo, "ob": ob}

        B, F, N, C = h.shape
        H, D = self.heads, C // self.heads
        dt = self.dtype
        q = _dense(h, wq, None, dt).reshape(B, F, N, H, D)
        k = _dense(h, wk, None, dt).reshape(B, F, N, H, D)
        v = _dense(h, wv, None, dt).reshape(B, F, N, H, D)
        if self.band and self.band < F - 1:
            out = _banded_frame_attention(q, k, v, self.band).reshape(B, F, N, C)
            return _dense(out, wo, ob, dt)
        form = os.environ.get("CONTROLANIMATE_MOTION_FORM", "auto")
        use_mulreduce = (
            N * D >= 4096 * 40 if form == "auto" else form == "mulreduce"
        )
        if use_mulreduce:
            # level-0 geometry: broadcast-mul + d-reduce stays on the VPU and
            # avoids the batched tiny (FxD)@(DxF) GEMMs — measured ~12%
            # faster than the einsum form at (.,16,4096,8x40) on v5e; the
            # einsum form stays faster at the narrower deep levels.
            # Multiplies run in the input dtype (bf16 VPU rate), the D- and
            # F-reductions accumulate in f32 — same policy as the einsum
            # form's bf16 dot with f32 softmax
            logits = (q[:, :, None] * k[:, None]).sum(-1, dtype=jnp.float32) * (
                D**-0.5
            )  # (B, F, G, N, H)
            probs = jax.nn.softmax(logits, axis=2).astype(q.dtype)
            out = (probs[..., None] * v[:, None]).sum(2, dtype=jnp.float32)
            out = out.astype(q.dtype).reshape(B, F, N, C)
        else:
            logits = jnp.einsum("bfnhd,bgnhd->bnhfg", q, k) * (D**-0.5)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bnhfg,bgnhd->bfnhd", probs, v).reshape(B, F, N, C)
        return _dense(out, wo, ob, dt)


def _banded_frame_attention(q, k, v, band: int):
    """Frame-axis attention restricted to |query_frame - key_frame| <= band,
    computed over the 2*band+1 shifted diagonals — O(F·band·N·C) on the VPU
    instead of the dense form's O(F²·N·C), with no (F, F) logits tensor.

    Shapes (B, F, N, H, D); pads K/V by `band` frames on each side so every
    offset is a static slice (XLA fuses the whole chain; no gathers).
    Out-of-range positions are masked to -inf before the softmax, so the
    result over the valid band is exactly softmax(q·k/sqrt(D))·v. Dtype
    policy matches the dense mulreduce form: multiplies in the input dtype,
    reductions accumulate in f32."""
    B, F, N, H, D = q.shape
    W = int(band)
    O = 2 * W + 1
    scale = D**-0.5
    pad = ((0, 0), (W, W), (0, 0), (0, 0), (0, 0))
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    logits = jnp.stack(
        [
            (q * jax.lax.slice_in_dim(kp, o, o + F, axis=1)).sum(
                -1, dtype=jnp.float32
            )
            * scale
            for o in range(O)
        ],
        axis=2,
    )  # (B, F, O, N, H)
    # offset o addresses key frame f + (o - W); mask pairs outside [0, F)
    tgt = np.arange(F)[:, None] + np.arange(O)[None, :] - W
    valid = jnp.asarray((tgt >= 0) & (tgt < F))
    logits = jnp.where(valid[None, :, :, None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=2).astype(q.dtype)
    out = sum(
        (probs[:, :, o, ..., None] * jax.lax.slice_in_dim(vp, o, o + F, axis=1)).astype(
            jnp.float32
        )
        for o in range(O)
    )
    return out.astype(q.dtype)


class TemporalAttentionBlock(nn.Module):
    """One 'Temporal_Self' attention sublayer with frame-axis PE."""

    heads: int
    max_len: int = 32
    use_pos_encoding: bool = True
    dtype: jnp.dtype = jnp.float32
    band: int = 0

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        C = x.shape[-1]
        ls, lb = _VecPair(C, name="norm")()
        attn = TemporalEinsumAttention(
            self.heads, name="attention", dtype=self.dtype, band=self.band
        )
        if return_params:
            ap = attn(x, return_params=True)
            return {"ls": ls, "lb": lb, **ap}

        B, F, N, C = x.shape
        if self.use_pos_encoding and F > self.max_len:
            raise ValueError(
                f"window of {F} frames exceeds the motion module's positional "
                f"table (max_len={self.max_len}; v1=24, v2=32 — reference "
                "motion_module.py:227-245). Lower frame_count or use the v2 module."
            )
        h = _layernorm(x, ls, lb)
        if self.use_pos_encoding:
            pe = temporal_positional_encoding(self.max_len, C)[:F]
            h = h + jnp.asarray(pe, h.dtype)[None, :, None, :]
        return x + attn(h)


class TemporalTransformerBlock(nn.Module):
    heads: int
    attention_block_types: Sequence[str] = ("Temporal_Self", "Temporal_Self")
    max_len: int = 32
    use_pos_encoding: bool = True
    dtype: jnp.dtype = jnp.float32
    band: int = 0

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        C = x.shape[-1]
        for block_type in self.attention_block_types:
            if block_type != "Temporal_Self":
                raise NotImplementedError(
                    f"attention block type {block_type!r}; the reference's shipped "
                    "configs use Temporal_Self only (inference-v{1,2}.yaml)"
                )
        blocks = [
            TemporalAttentionBlock(
                self.heads,
                self.max_len,
                self.use_pos_encoding,
                name=f"attention_blocks_{i}",
                dtype=self.dtype,
                band=self.band,
            )
            for i in range(len(self.attention_block_types))
        ]
        ls, lb = _VecPair(C, name="norm")()
        # FeedForward tree: ff/net_0/proj + ff/net_2 (layers.FeedForward)
        w1, b1, w2, b2 = _FFParams(C, name="ff")()
        if return_params:
            return {
                "blocks": [b(x, return_params=True) for b in blocks],
                "lsf": ls, "lbf": lb, "w1": w1, "b1": b1, "w2": w2, "b2": b2,
            }

        for b in blocks:
            x = b(x)
        h = _layernorm(x, ls, lb)
        # GEGLU FFN (layers.FeedForward semantics: exact-erf gelu on the
        # gate half, matching diffusers F.gelu)
        g = _dense(h, w1, b1, self.dtype)
        inner = g.shape[-1] // 2
        ff = g[..., :inner] * nn.gelu(g[..., inner:], approximate=False)
        ff = _dense(ff, w2, b2, self.dtype)
        return x + ff


class _FFParams(nn.Module):
    """Parameter mirror of layers.FeedForward (GEGLU): ff/net_0/proj/{kernel,
    bias}, ff/net_2/{kernel,bias}."""

    features: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        class _Net0(nn.Module):
            in_features: int
            out_features: int

            @nn.compact
            def __call__(self):
                return _DenseParams(
                    self.in_features, self.out_features * 2, name="proj"
                )()

        inner = self.features * self.mult
        w1, b1 = _Net0(self.features, inner, name="net_0")()
        w2, b2 = _DenseParams(inner, self.features, name="net_2")()
        return w1, b1, w2, b2


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
    band: int = 0
    # ToMe spatial-token merging around the temporal transformer (opt-in,
    # RunConfig.token_merge_motion): everything between proj_in and proj_out
    # is a per-spatial-position map, so merging the token axis (same token
    # set for every frame, frame-mean metric) cuts the module's cost
    # linearly in the ratio. A beyond-reference extension of ToMe-SD
    # (arXiv:2303.17604 merges for spatial attention only — SD has no
    # temporal module); one plan per module call, not per frame.
    tome_ratio: float = 0.0
    tome_min_tokens: int = 4096

    @nn.compact
    def __call__(self, x):
        """x: (B, F, H, W, C) -> same, residual."""
        B, F, H, W, C = x.shape
        N = H * W
        gs, gb = _VecPair(C, name="norm")()
        win, bin_ = _DenseParams(C, C, name="proj_in")()
        blocks = [
            TemporalTransformerBlock(
                self.heads,
                self.attention_block_types,
                self.max_len,
                self.use_pos_encoding,
                name=f"transformer_blocks_{i}",
                dtype=self.dtype,
                band=self.band,
            )
            for i in range(self.num_transformer_block)
        ]
        wout, bout = _DenseParams(C, C, zero_init=True, name="proj_out")()

        if self.use_pos_encoding and F > self.max_len:
            raise ValueError(
                f"window of {F} frames exceeds the motion module's positional "
                f"table (max_len={self.max_len}; v1=24, v2=32 — reference "
                "motion_module.py:227-245). Lower frame_count or use the v2 module."
            )

        h4 = x.reshape(B, F, N, C)
        nblk = pick_nblk(F, N, C, jnp.dtype(self.dtype).itemsize)
        band_active = bool(self.band) and self.band < F - 1
        tome_active = self.tome_ratio > 0.0 and N >= self.tome_min_tokens
        use_fused = (
            motion_kernel_enabled()
            and not band_active  # fused kernel computes dense frame attention
            and not tome_active  # merged tokens take the XLA path below
            and self.num_transformer_block == 1
            and len(self.attention_block_types) == 2
            and nblk is not None
            and C % self.heads == 0
            and _on_tpu()
            and _single_device()
        )
        if use_fused:
            tp = blocks[0](jnp.zeros((0, 0, 0, C), x.dtype), return_params=True)
            # GroupNorm stats are per (B·F) sample over all spatial locations
            # (reference motion_module.py:111 uses eps=1e-6, not the UNet
            # resnets' 1e-5)
            a, b = groupnorm_fold(
                h4.reshape(B * F, N, C), gs, gb, self.groups, eps=1e-6
            )
            p = {
                "gn_a": a.reshape(B, F, C), "gn_b": b.reshape(B, F, C),
                "win": win, "bin": bin_,
                "wout": wout, "bout": bout,
                "lsf": tp["lsf"], "lbf": tp["lbf"],
                "w1": tp["w1"], "b1": tp["b1"], "w2": tp["w2"], "b2": tp["b2"],
            }
            for i, bp in enumerate(tp["blocks"]):
                p[f"ls{i}"] = bp["ls"]
                p[f"lb{i}"] = bp["lb"]
                p[f"wq{i}"] = bp["wq"]
                p[f"wk{i}"] = bp["wk"]
                p[f"wv{i}"] = bp["wv"]
                p[f"wo{i}"] = bp["wo"]
                p[f"ob{i}"] = bp["ob"]
            pe = (
                temporal_positional_encoding(self.max_len, C)[:F]
                if self.use_pos_encoding
                else None
            )
            # kernel returns the delta; add the residual here in the input
            # dtype so fused/unfused paths promote identically (ADVICE r2)
            delta = motion_module_fused(
                h4.astype(self.dtype), p, heads=self.heads, pe=pe, nblk=nblk
            )
            return x + delta.reshape(B, F, H, W, C)

        # per-frame GroupNorm over channels (reference:
        # TemporalTransformer3DModel.norm is a plain GroupNorm over c)
        flat = h4.reshape(B * F, N, C)
        a, b = groupnorm_fold(flat, gs, gb, self.groups, eps=1e-6)
        h = flat * a[:, None, :] + b[:, None, :]
        h = _dense(h, win, bin_, self.dtype)
        h = h.reshape(B, F, N, C)
        if tome_active:
            from ..ops.token_merge import build_merge

            # one plan per module call: frame-mean metric, identical token
            # set merged in every frame (the temporal attention mixes frames
            # per position, so the partition must be frame-consistent). The
            # merge closures are channel-agnostic, so a (B, N, F*C) view
            # merges all frames in one gather/scatter.
            metric = h.mean(axis=1)  # (B, N, C)
            merge, unmerge, n_merged = build_merge(
                metric, H, W, self.tome_ratio
            )
            hv = h.transpose(0, 2, 1, 3).reshape(B, N, F * C)
            hm = merge(hv).reshape(B, n_merged, F, C).transpose(0, 2, 1, 3)
            for blk in blocks:
                hm = blk(hm)
            hm = _dense(hm, wout, bout, self.dtype)
            yv = hm.transpose(0, 2, 1, 3).reshape(B, n_merged, F * C)
            y = unmerge(yv).reshape(B, N, F, C).transpose(0, 2, 1, 3)
            return x + y.reshape(B, F, H, W, C)
        for blk in blocks:
            h = blk(h)
        h = _dense(h, wout, bout, self.dtype)
        return x + h.reshape(B, F, H, W, C)
