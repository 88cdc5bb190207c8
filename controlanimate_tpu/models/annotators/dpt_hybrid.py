"""DPT-hybrid monocular depth estimator in Flax (Intel/dpt-hybrid-midas
layout): BiT (ResNetv2 bottleneck) backbone + ViT encoder + hybrid neck.

Completes the depth annotator story (reference:
modules/controlresiduals_pipeline.py:63 — the HF `depth-estimation`
pipeline's hybrid checkpoints previously fell back to host torch). Golden-
tested against transformers DPTForDepthEstimation(is_hybrid=True).

Hybrid specifics vs the plain-ViT port (dpt.py):
  * patches come from the BiT stage-3 feature map (1x1 projection), not raw
    pixels;
  * the first two neck inputs are the BiT stage-1/2 feature maps passed
    through untouched (transformers neck_ignore_stages=[0, 1]);
  * only the last two neck inputs are ViT taps (backbone_out_indices[2:])
    with 'project' readout.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest
from .dpt import DPTFusionLayer, ViTLayer, _resize_align_corners


def _make_div(value: float, divisor: int = 8) -> int:
    new = max(divisor, int(value + divisor / 2) // divisor * divisor)
    if new < 0.9 * value:
        new += divisor
    return new


class WSConv(nn.Module):
    """Weight-standardized conv with TF-SAME padding (transformers
    WeightStandardizedConv2d: per-output-channel standardization with biased
    variance, eps=1e-8)."""

    features: int
    kernel: int
    stride: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_chs = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel, self.kernel, in_chs, self.features),
        )
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) * jax.lax.rsqrt(var + self.eps)
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class GroupNormExact(nn.Module):
    """torch-parity GroupNorm (two-pass variance, eps=1e-5) + optional relu
    (transformers BitGroupNormActivation)."""

    num_groups: int
    act: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        B = x.shape[0]
        g = x.reshape(B, -1, self.num_groups, C // self.num_groups)
        mean = jnp.mean(g, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(g - mean), axis=(1, 3), keepdims=True)
        g = (g - mean) * jax.lax.rsqrt(var + self.eps)
        y = g.reshape(x.shape) * scale + bias
        return nn.relu(y) if self.act else y


class BitBottleneck(nn.Module):
    """Non-preact (v1.5) bottleneck used by ViT-hybrid (transformers
    BitBottleneckLayer): conv1/norm1 -> conv2(stride)/norm2 -> conv3/norm3
    (no act) -> relu(x + shortcut)."""

    out_chs: int
    stride: int = 1
    num_groups: int = 32
    is_first: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = _make_div(self.out_chs * 0.25)
        shortcut = x
        if self.is_first:
            s = WSConv(self.out_chs, 1, self.stride, name="downsample_conv")(x)
            shortcut = GroupNormExact(self.num_groups, act=False, name="downsample_norm")(s)
        h = WSConv(mid, 1, name="conv1")(x)
        h = GroupNormExact(self.num_groups, name="norm1")(h)
        h = WSConv(mid, 3, self.stride, name="conv2")(h)
        h = GroupNormExact(self.num_groups, name="norm2")(h)
        h = WSConv(self.out_chs, 1, name="conv3")(h)
        h = GroupNormExact(self.num_groups, act=False, name="norm3")(h)
        return nn.relu(h + shortcut)


@dataclass(frozen=True)
class BitCfg:
    """google/vit-hybrid BiT-R50 geometry (transformers BitConfig for
    dpt-hybrid: layer_type=bottleneck, 3 stages)."""

    embedding_size: int = 64
    hidden_sizes: tuple = (256, 512, 1024)
    depths: tuple = (3, 4, 9)
    num_groups: int = 32


class BitBackbone(nn.Module):
    """Stem (WSConv7x7/2 + GN + maxpool3x3/2 SAME) + 3 bottleneck stages;
    returns [stage1(/4), stage2(/8), stage3(/16)] feature maps."""

    cfg: BitCfg = field(default_factory=BitCfg)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        c = self.cfg
        x = WSConv(c.embedding_size, 7, 2, name="stem_conv")(x)
        x = GroupNormExact(c.num_groups, name="stem_norm")(x)
        # torch pads zeros, but the input is post-relu (>=0) so -inf SAME
        # pooling is equivalent
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        outs = []
        for s, (depth, width) in enumerate(zip(c.depths, c.hidden_sizes)):
            stride = 1 if s == 0 else 2
            for i in range(depth):
                x = BitBottleneck(
                    _make_div(width), stride if i == 0 else 1, c.num_groups,
                    is_first=i == 0, name=f"stage_{s}_layer_{i}",
                )(x)
            outs.append(x)
        return outs


class DPTHybridDepth(nn.Module):
    """Full DPT-hybrid graph (transformers DPTForDepthEstimation with
    is_hybrid=True)."""

    bit: BitCfg = field(default_factory=BitCfg)
    hidden_size: int = 768
    num_layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    patch: int = 16
    taps: tuple = (2, 5, 8, 11)  # backbone_out_indices; only [2:] are ViT taps
    neck_hidden: tuple = (256, 512, 768, 768)
    reassemble_factors: tuple = (1, 1, 1, 0.5)
    fusion_hidden: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) normalized -> depth (B, H, W)."""
        B, H, W, _ = x.shape
        s1, s2, s3 = BitBackbone(self.bit, name="backbone")(x)

        gh, gw = s3.shape[1], s3.shape[2]
        tokens = nn.Conv(self.hidden_size, (1, 1), name="projection")(s3)
        tokens = tokens.reshape(B, gh * gw, self.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.hidden_size))
        pos = self.param(
            "position_embeddings", nn.initializers.zeros,
            (1, (H // self.patch) * (W // self.patch) + 1, self.hidden_size),
        )
        if pos.shape[1] != gh * gw + 1:
            # torch _resize_pos_embed: bilinear over the stored square grid
            old = int(round((pos.shape[1] - 1) ** 0.5))
            grid = pos[:, 1:].reshape(1, old, old, self.hidden_size)
            grid = jax.image.resize(grid, (1, gh, gw, self.hidden_size), "bilinear")
            pos = jnp.concatenate([pos[:, :1], grid.reshape(1, gh * gw, -1)], axis=1)
        h = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.hidden_size)), tokens], 1)
        h = h + pos

        vit_taps = {}
        want = set(self.taps[2:])
        for i in range(self.num_layers):
            h = ViTLayer(self.heads, self.mlp_dim, name=f"layer_{i}")(h)
            if i in want:
                vit_taps[i] = h

        # hybrid neck inputs: [bit stage1, bit stage2, vit tap, vit tap]
        feats = [s1, s2]
        for li, tap_idx in enumerate(self.taps[2:], start=2):
            t = vit_taps[tap_idx]
            cls_tok, toks = t[:, :1], t[:, 1:]
            readout = jnp.concatenate([toks, jnp.broadcast_to(cls_tok, toks.shape)], -1)
            r = nn.gelu(
                nn.Dense(self.hidden_size, name=f"readout_{li}")(readout),
                approximate=False,
            )
            f = r.reshape(B, gh, gw, self.hidden_size)
            f = nn.Conv(self.neck_hidden[li], (1, 1), name=f"reassemble_proj_{li}")(f)
            factor = self.reassemble_factors[li]
            if factor > 1:
                k = int(factor)
                f = nn.ConvTranspose(
                    self.neck_hidden[li], (k, k), strides=(k, k), padding="VALID",
                    transpose_kernel=True, name=f"resize_{li}",
                )(f)
            elif factor < 1:
                k = int(round(1 / factor))
                f = nn.Conv(
                    self.neck_hidden[li], (3, 3), strides=k, padding=1,
                    name=f"resize_{li}",
                )(f)
            feats.append(f)

        feats = [
            nn.Conv(self.fusion_hidden, (3, 3), padding=1, use_bias=False,
                    name=f"neck_conv_{li}")(f)
            for li, f in enumerate(feats)
        ]

        fused = DPTFusionLayer(name="fusion_3")(feats[3])
        fused = DPTFusionLayer(name="fusion_2")(fused, feats[2])
        fused = DPTFusionLayer(name="fusion_1")(fused, feats[1])
        fused = DPTFusionLayer(name="fusion_0")(fused, feats[0])

        d = nn.Conv(self.fusion_hidden // 2, (3, 3), padding=1, name="head_conv1")(fused)
        Bh, Hh, Wh, Ch = d.shape
        d = jax.image.resize(d, (Bh, Hh * 2, Wh * 2, Ch), "bilinear")
        d = nn.relu(nn.Conv(32, (3, 3), padding=1, name="head_conv2")(d))
        d = nn.relu(nn.Conv(1, (1, 1), name="head_conv3")(d))
        return d[..., 0]


# ------------------------------------------------------------ weight loading


def dpt_hybrid_params_from_torch(sd: dict, cfg: dict) -> dict:
    """transformers DPTForDepthEstimation (is_hybrid) state dict -> flax."""

    def dense(t):
        return {"kernel": ingest.dense_kernel(sd[f"{t}.weight"]), "bias": sd[f"{t}.bias"]}

    def conv(t, bias=True):
        p = {"kernel": ingest.conv_kernel(sd[f"{t}.weight"])}
        if bias:
            p["bias"] = sd[f"{t}.bias"]
        return p

    def wsconv(t):
        return {"kernel": ingest.conv_kernel(sd[f"{t}.weight"])}

    def gn(t):
        return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    def ln(t):
        return {"scale": sd[f"{t}.weight"], "bias": sd[f"{t}.bias"]}

    emb = "dpt.embeddings"
    bit = f"{emb}.backbone.bit"
    bb: dict = {
        "stem_conv": wsconv(f"{bit}.embedder.convolution"),
        "stem_norm": gn(f"{bit}.embedder.norm"),
    }
    depths = tuple(cfg.get("backbone_config", {}).get("depths", (3, 4, 9)))
    for s in range(len(depths)):
        for i in range(depths[s]):
            t = f"{bit}.encoder.stages.{s}.layers.{i}"
            layer = {
                "conv1": wsconv(f"{t}.conv1"),
                "norm1": gn(f"{t}.norm1"),
                "conv2": wsconv(f"{t}.conv2"),
                "norm2": gn(f"{t}.norm2"),
                "conv3": wsconv(f"{t}.conv3"),
                "norm3": gn(f"{t}.norm3"),
            }
            if f"{t}.downsample.conv.weight" in sd:
                layer["downsample_conv"] = wsconv(f"{t}.downsample.conv")
                layer["downsample_norm"] = gn(f"{t}.downsample.norm")
            bb[f"stage_{s}_layer_{i}"] = layer

    params: dict = {
        "backbone": bb,
        "projection": conv(f"{emb}.projection"),
        "cls_token": np.asarray(sd[f"{emb}.cls_token"])[0:1],
        "position_embeddings": np.asarray(sd[f"{emb}.position_embeddings"]),
    }
    num_layers = int(cfg.get("num_hidden_layers", 12))
    for i in range(num_layers):
        p = f"dpt.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "layernorm_before": ln(f"{p}.layernorm_before"),
            "layernorm_after": ln(f"{p}.layernorm_after"),
            "query": dense(f"{p}.attention.attention.query"),
            "key": dense(f"{p}.attention.attention.key"),
            "value": dense(f"{p}.attention.attention.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
        }
    factors = tuple(cfg.get("reassemble_factors", (1, 1, 1, 0.5)))
    for li in (2, 3):
        rp = f"neck.reassemble_stage.layers.{li}"
        params[f"readout_{li}"] = dense(f"neck.reassemble_stage.readout_projects.{li}.0")
        params[f"reassemble_proj_{li}"] = conv(f"{rp}.projection")
        if factors[li] > 1:
            w = sd[f"{rp}.resize.weight"]  # ConvTranspose (I, O, kh, kw)
            params[f"resize_{li}"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": sd[f"{rp}.resize.bias"]
            }
        elif factors[li] < 1:
            params[f"resize_{li}"] = conv(f"{rp}.resize")
    for li in range(4):
        params[f"neck_conv_{li}"] = conv(f"neck.convs.{li}", bias=False)
    for li in range(4):
        fp = f"neck.fusion_stage.layers.{3 - li}"
        entry = {
            "projection": conv(f"{fp}.projection"),
            "residual_layer2": {
                "conv1": conv(f"{fp}.residual_layer2.convolution1"),
                "conv2": conv(f"{fp}.residual_layer2.convolution2"),
            },
        }
        if f"{fp}.residual_layer1.convolution1.weight" in sd:
            entry["residual_layer1"] = {
                "conv1": conv(f"{fp}.residual_layer1.convolution1"),
                "conv2": conv(f"{fp}.residual_layer1.convolution2"),
            }
        params[f"fusion_{li}"] = entry
    params["head_conv1"] = conv("head.head.0")
    params["head_conv2"] = conv("head.head.2")
    params["head_conv3"] = conv("head.head.4")
    return params


def model_from_config(cfg: dict) -> DPTHybridDepth:
    bcfg = cfg.get("backbone_config") or {}
    return DPTHybridDepth(
        bit=BitCfg(
            embedding_size=bcfg.get("embedding_size", 64),
            hidden_sizes=tuple(bcfg.get("hidden_sizes", (256, 512, 1024))),
            depths=tuple(bcfg.get("depths", (3, 4, 9))),
            num_groups=bcfg.get("num_groups", 32),
        ),
        hidden_size=cfg.get("hidden_size", 768),
        num_layers=cfg.get("num_hidden_layers", 12),
        heads=cfg.get("num_attention_heads", 12),
        mlp_dim=cfg.get("intermediate_size", 3072),
        patch=cfg.get("patch_size", 16),
        taps=tuple(cfg.get("backbone_out_indices", (2, 5, 8, 11))),
        neck_hidden=tuple(cfg.get("neck_hidden_sizes", (256, 512, 768, 768))),
        reassemble_factors=tuple(cfg.get("reassemble_factors", (1, 1, 1, 0.5))),
        fusion_hidden=cfg.get("fusion_hidden_size", 256),
    )


_CACHE: dict = {}

_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_STD = np.array([0.5, 0.5, 0.5], np.float32)


def run_flax(frames: np.ndarray, model_dir) -> np.ndarray:
    """(F, H, W, 3) uint8 -> (F, H, W, 3) normalized depth maps, on device
    (hybrid-checkpoint counterpart of dpt.run_flax)."""
    import json
    from pathlib import Path

    import cv2

    model_dir = Path(model_dir)
    cfg = json.loads((model_dir / "config.json").read_text())
    if not cfg.get("is_hybrid", False) or cfg.get("model_type") != "dpt":
        raise FileNotFoundError("not a hybrid DPT checkpoint")
    key = str(model_dir)
    if key not in _CACHE:
        _, sd = ingest.load_hf_component(model_dir, "")
        model = model_from_config(cfg)
        params = dpt_hybrid_params_from_torch(sd, cfg)
        _CACHE[key] = (jax.jit(lambda p, x: model.apply({"params": p}, x)), jax.device_put(params))
    fn, params = _CACHE[key]
    F, H, W, _ = frames.shape
    size = 384  # dpt-hybrid-midas native resolution
    x = np.stack([cv2.resize(f, (size, size), interpolation=cv2.INTER_CUBIC) for f in frames])
    x = (x.astype(np.float32) / 255.0 - _MEAN) / _STD
    depth = np.asarray(fn(params, jnp.asarray(x)))
    out = []
    for d in depth:
        d = cv2.resize(d, (W, H), interpolation=cv2.INTER_CUBIC)
        d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
        out.append(np.repeat(d[:, :, None], 3, axis=2))
    return np.stack(out).astype(np.float32)
