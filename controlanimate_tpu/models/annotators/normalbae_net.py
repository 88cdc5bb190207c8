"""NormalBae surface-normal estimator: EfficientNet-B5 encoder + NNET decoder.

Flax port of the model the reference runs through controlnet_aux's
NormalBaeDetector (reference: modules/controlresiduals_pipeline.py:56-62 —
`NormalBaeDetector.from_pretrained(...)` loads `scannet.pt`, an NNET from
"Estimating and Exploiting the Aleatoric Uncertainty in Surface Normal
Estimation" with a gen-efficientnet tf_efficientnet_b5_ap backbone).

Structure mirrored exactly for checkpoint parity:
  encoder: gen-efficientnet GenEfficientNet(tf_efficientnet_b5_ap) —
    conv_stem/bn1/act1, 7 MBConv stages, conv_head; the decoder consumes the
    feature list at indices [4, 5, 6, 8, 11] = stage0/1/2/4 outputs + RAW
    conv_head output (pre-bn2), channels 24/40/64/176/2048.
  decoder: conv2 (1x1, 2048), UpSampleBN x4 (1024/512/256/128), dense
    test-mode coarse-to-fine heads out_conv_res8/4/2/1 with norm_normalize
    (L2-normalized normal + ELU kappa) at each scale.

TPU-first details: channels-last throughout, inference BatchNorm folded to a
single affine, TF "SAME" padding comes free from XLA's SAME convention
(gen-efficientnet's Conv2dSame emulates exactly this).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------- primitives


class BatchNormInference(nn.Module):
    """Inference-time BatchNorm: affine from stored running statistics.

    Folding happens at runtime in fp32 (cheap: per-channel scalars), keeping
    the stored params bit-identical to the torch buffers for testability."""

    eps: float = 1e-3  # tf_ efficientnet variants use TF's 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (C,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (C,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x * inv + (bias - mean * inv)).astype(x.dtype)


class SqueezeExcite(nn.Module):
    """gen-efficientnet SqueezeExcite: reduce is computed from the BLOCK
    INPUT channel count (not the expanded width)."""

    reduced: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name="conv_expand")(s)
        return x * jax.nn.sigmoid(s)


class DepthwiseSeparable(nn.Module):
    """Stage-0 block (expand ratio 1): conv_dw -> bn1 -> act -> se ->
    conv_pw -> bn2 (no activation after the pointwise projection)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_chs = x.shape[-1]
        residual = x
        x = nn.Conv(
            in_chs, (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", feature_group_count=in_chs, use_bias=False,
            name="conv_dw",
        )(x)
        x = BatchNormInference(self.bn_eps, name="bn1")(x)
        x = nn.silu(x)
        x = SqueezeExcite(max(1, int(in_chs * 0.25)), name="se")(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, name="conv_pw")(x)
        x = BatchNormInference(self.bn_eps, name="bn2")(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + residual
        return x


class InvertedResidual(nn.Module):
    """MBConv: conv_pw(expand) -> bn1 -> act -> conv_dw -> bn2 -> act -> se
    -> conv_pwl(project) -> bn3 (+skip)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_chs = x.shape[-1]
        residual = x
        mid = in_chs * self.expand
        x = nn.Conv(mid, (1, 1), use_bias=False, name="conv_pw")(x)
        x = BatchNormInference(self.bn_eps, name="bn1")(x)
        x = nn.silu(x)
        x = nn.Conv(
            mid, (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", feature_group_count=mid, use_bias=False,
            name="conv_dw",
        )(x)
        x = BatchNormInference(self.bn_eps, name="bn2")(x)
        x = nn.silu(x)
        x = SqueezeExcite(max(1, int(in_chs * 0.25)), name="se")(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, name="conv_pwl")(x)
        x = BatchNormInference(self.bn_eps, name="bn3")(x)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + residual
        return x


@dataclass(frozen=True)
class EffNetConfig:
    """tf_efficientnet_b5_ap geometry (width 1.6 / depth 2.2 applied to the
    B0 base and rounded with divisor 8, as gen-efficientnet does)."""

    stem: int = 48
    widths: tuple = (24, 40, 64, 128, 176, 304, 512)
    repeats: tuple = (3, 5, 5, 7, 7, 9, 3)
    expands: tuple = (1, 6, 6, 6, 6, 6, 6)
    kernels: tuple = (3, 3, 5, 3, 5, 5, 3)
    strides: tuple = (1, 2, 2, 2, 1, 2, 1)
    head: int = 2048
    bn_eps: float = 1e-3


class EfficientNetFeatures(nn.Module):
    """Backbone returning the five feature maps NNET consumes
    (stage0/1/2/4 outputs and the RAW conv_head output — the decoder indexes
    the gen-efficientnet module-output list at [4, 5, 6, 8, 11], i.e.
    conv_head BEFORE bn2/act2)."""

    cfg: EffNetConfig = field(default_factory=EffNetConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        c = self.cfg
        x = x.astype(self.dtype)
        x = nn.Conv(c.stem, (3, 3), strides=2, padding="SAME", use_bias=False,
                    name="conv_stem")(x)
        x = BatchNormInference(c.bn_eps, name="bn1")(x)
        x = nn.silu(x)
        stage_outs = []
        for s in range(7):
            for i in range(c.repeats[s]):
                stride = c.strides[s] if i == 0 else 1
                name = f"blocks_{s}_{i}"
                if c.expands[s] == 1:
                    x = DepthwiseSeparable(
                        c.widths[s], c.kernels[s], stride, c.bn_eps, name=name
                    )(x)
                else:
                    x = InvertedResidual(
                        c.widths[s], c.kernels[s], stride, c.expands[s],
                        c.bn_eps, name=name,
                    )(x)
            stage_outs.append(x)
        head = nn.Conv(c.head, (1, 1), use_bias=False, name="conv_head")(x)
        # [block0, block1, block2, block4, conv_head] = features[4,5,6,8,11]
        return [stage_outs[0], stage_outs[1], stage_outs[2], stage_outs[4], head]


# ------------------------------------------------------------------- decoder


def _bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) over
    channels-last (B, H, W, C)."""
    B, H, W, C = x.shape
    rows = jnp.linspace(0.0, H - 1.0, out_h) if out_h > 1 else jnp.zeros((out_h,))
    cols = jnp.linspace(0.0, W - 1.0, out_w) if out_w > 1 else jnp.zeros((out_w,))
    r0 = jnp.floor(rows).astype(jnp.int32)
    c0 = jnp.floor(cols).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, H - 1)
    c1 = jnp.minimum(c0 + 1, W - 1)
    wr = (rows - r0).astype(x.dtype)[None, :, None, None]
    wc = (cols - c0).astype(x.dtype)[None, None, :, None]
    top = x[:, r0]
    bot = x[:, r1]
    tl, tr = top[:, :, c0], top[:, :, c1]
    bl, br = bot[:, :, c0], bot[:, :, c1]
    t = tl * (1 - wc) + tr * wc
    b = bl * (1 - wc) + br * wc
    return t * (1 - wr) + b * wr


def norm_normalize(out: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize the normal channels, ELU+1+0.01 the kappa channel
    (surface_normal_uncertainty utils.norm_normalize; channels-last)."""
    n, kappa = out[..., :3], out[..., 3:]
    norm = jnp.sqrt(jnp.sum(jnp.square(n), axis=-1, keepdims=True)) + 1e-10
    kappa = nn.elu(kappa) + 1.0 + 0.01
    return jnp.concatenate([n / norm, kappa], axis=-1)


class UpSampleBN(nn.Module):
    """Bilinear-upsample to the skip's size, concat, 2x (conv3x3+BN+LeakyReLU)
    (surface_normal_uncertainty submodules.UpSampleBN)."""

    out_chs: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        x = _bilinear_align_corners(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
        # torch Sequential indices: 0 conv, 1 bn, 2 lrelu, 3 conv, 4 bn, 5 lrelu
        x = nn.Conv(self.out_chs, (3, 3), padding="SAME", name="net_0")(x)
        x = BatchNormInference(1e-5, name="net_1")(x)  # torch BN default eps
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(self.out_chs, (3, 3), padding="SAME", name="net_3")(x)
        x = BatchNormInference(1e-5, name="net_4")(x)
        return nn.leaky_relu(x, 0.01)


class PixelMLP(nn.Module):
    """The out_conv_res{4,2,1} heads: a stack of 1x1 Conv1d + ReLU applied
    per pixel (torch runs them on a flattened (B, C, H*W) view)."""

    hidden: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Conv(self.hidden, (1, 1), name="c0")(x))
        x = nn.relu(nn.Conv(self.hidden, (1, 1), name="c2")(x))
        x = nn.relu(nn.Conv(self.hidden, (1, 1), name="c4")(x))
        return nn.Conv(4, (1, 1), name="c6")(x)


class NNETDecoder(nn.Module):
    """Dense (test-mode) NNET decoder (surface_normal_uncertainty
    decoder.forward mode!='train': every pixel refined, no importance
    sampling)."""

    features: tuple = (1024, 512, 256, 128)  # up1..up4 widths
    hidden: int = 128

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        b0, b1, b2, b4, head = feats
        x_d0 = nn.Conv(head.shape[-1], (1, 1), name="conv2")(head)
        x_d1 = UpSampleBN(self.features[0], name="up1")(x_d0, b4)
        x_d2 = UpSampleBN(self.features[1], name="up2")(x_d1, b2)
        x_d3 = UpSampleBN(self.features[2], name="up3")(x_d2, b1)
        x_d4 = UpSampleBN(self.features[3], name="up4")(x_d3, b0)

        out_res8 = norm_normalize(
            nn.Conv(4, (3, 3), padding="SAME", name="out_conv_res8")(x_d2)
        )

        def refine(feat, prev, head_name):
            H, W = feat.shape[1] * 2, feat.shape[2] * 2
            fm = _bilinear_align_corners(feat, H, W)
            pred = _bilinear_align_corners(prev, H, W)
            out = PixelMLP(self.hidden, name=head_name)(
                jnp.concatenate([fm, pred], axis=-1)
            )
            return norm_normalize(out)

        out_res4 = refine(x_d2, out_res8, "out_conv_res4")
        out_res2 = refine(x_d3, out_res4, "out_conv_res2")
        out_res1 = refine(x_d4, out_res2, "out_conv_res1")
        return out_res1


class NormalBaeNNET(nn.Module):
    """Full NNET: returns the finest-scale (input-resolution) prediction,
    (B, H, W, 4) = unit normal xyz + kappa (controlnet_aux consumes
    model(img)[0][-1][:, :3])."""

    effnet: EffNetConfig = field(default_factory=EffNetConfig)
    dec_features: tuple = (1024, 512, 256, 128)
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = EfficientNetFeatures(self.effnet, dtype=self.dtype, name="encoder")(x)
        return NNETDecoder(self.dec_features, self.hidden, name="decoder")(feats)


# ------------------------------------------------------------ weight loading


def _conv(w) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dwconv(w) -> np.ndarray:
    """torch depthwise conv (C, 1, kh, kw) -> flax (kh, kw, 1, C)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _conv1d(w) -> np.ndarray:
    """torch Conv1d (O, I, 1) -> flax 1x1 conv (1, 1, I, O)."""
    w = np.asarray(w)
    return np.transpose(w, (2, 1, 0))[None]


def _bn(sd: dict, prefix: str) -> dict:
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def nnet_params_from_torch(sd: dict, cfg: EffNetConfig = EffNetConfig()) -> dict:
    """Convert a scannet.pt-layout state dict (controlnet_aux NormalBae:
    keys `encoder.original_model.*` + `decoder.*`, possibly `module.`- or
    `model.`-prefixed) into this module's param tree."""
    sd = {
        k.removeprefix("module.").removeprefix("model."): v for k, v in sd.items()
    }
    enc_p = "encoder.original_model"
    enc: dict = {
        "conv_stem": {"kernel": _conv(sd[f"{enc_p}.conv_stem.weight"])},
        "bn1": _bn(sd, f"{enc_p}.bn1"),
        "conv_head": {"kernel": _conv(sd[f"{enc_p}.conv_head.weight"])},
    }
    for s in range(7):
        for i in range(cfg.repeats[s]):
            t = f"{enc_p}.blocks.{s}.{i}"
            blk: dict = {
                "se": {
                    "conv_reduce": {
                        "kernel": _conv(sd[f"{t}.se.conv_reduce.weight"]),
                        "bias": np.asarray(sd[f"{t}.se.conv_reduce.bias"]),
                    },
                    "conv_expand": {
                        "kernel": _conv(sd[f"{t}.se.conv_expand.weight"]),
                        "bias": np.asarray(sd[f"{t}.se.conv_expand.bias"]),
                    },
                },
            }
            if cfg.expands[s] == 1:
                blk.update({
                    "conv_dw": {"kernel": _dwconv(sd[f"{t}.conv_dw.weight"])},
                    "bn1": _bn(sd, f"{t}.bn1"),
                    "conv_pw": {"kernel": _conv(sd[f"{t}.conv_pw.weight"])},
                    "bn2": _bn(sd, f"{t}.bn2"),
                })
            else:
                blk.update({
                    "conv_pw": {"kernel": _conv(sd[f"{t}.conv_pw.weight"])},
                    "bn1": _bn(sd, f"{t}.bn1"),
                    "conv_dw": {"kernel": _dwconv(sd[f"{t}.conv_dw.weight"])},
                    "bn2": _bn(sd, f"{t}.bn2"),
                    "conv_pwl": {"kernel": _conv(sd[f"{t}.conv_pwl.weight"])},
                    "bn3": _bn(sd, f"{t}.bn3"),
                })
            enc[f"blocks_{s}_{i}"] = blk

    dec: dict = {
        "conv2": {
            "kernel": _conv(sd["decoder.conv2.weight"]),
            "bias": np.asarray(sd["decoder.conv2.bias"]),
        },
        "out_conv_res8": {
            "kernel": _conv(sd["decoder.out_conv_res8.weight"]),
            "bias": np.asarray(sd["decoder.out_conv_res8.bias"]),
        },
    }
    for u in ("up1", "up2", "up3", "up4"):
        t = f"decoder.{u}._net"
        dec[u] = {
            "net_0": {"kernel": _conv(sd[f"{t}.0.weight"]),
                      "bias": np.asarray(sd[f"{t}.0.bias"])},
            "net_1": _bn(sd, f"{t}.1"),
            "net_3": {"kernel": _conv(sd[f"{t}.3.weight"]),
                      "bias": np.asarray(sd[f"{t}.3.bias"])},
            "net_4": _bn(sd, f"{t}.4"),
        }
    for h in ("out_conv_res4", "out_conv_res2", "out_conv_res1"):
        t = f"decoder.{h}"
        dec[h] = {
            f"c{j}": {"kernel": _conv1d(sd[f"{t}.{j}.weight"]),
                      "bias": np.asarray(sd[f"{t}.{j}.bias"])}
            for j in (0, 2, 4, 6)
        }
    return {"encoder": enc, "decoder": dec}


# --------------------------------------------------------------- annotator

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_CACHE: dict = {}


def run(frames: np.ndarray) -> np.ndarray:
    """(F, H, W, 3) uint8 -> (F, H, W, 3) float [0,1] NormalBae RGB encoding
    (controlnet_aux NormalBaeDetector.__call__: ImageNet-normalized input,
    output (normal+1)/2)."""
    ckpt = Path(os.environ.get(
        "CONTROLANIMATE_NORMALBAE_MODEL", "models/annotators/normalbae/scannet.pt"
    ))
    if not ckpt.exists():
        raise FileNotFoundError(f"NormalBae checkpoint not found at {ckpt}")
    if "apply" not in _CACHE:
        from ...weights import ingest

        raw = ingest.load_state_dict(ckpt)
        if "model" in raw and isinstance(raw["model"], dict):
            raw = raw["model"]
        params = nnet_params_from_torch(raw)
        model = NormalBaeNNET()
        _CACHE["apply"] = jax.jit(
            lambda p, x: model.apply({"params": p}, x)
        )
        _CACHE["params"] = jax.device_put(params)
    x = (np.asarray(frames, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    out = _CACHE["apply"](_CACHE["params"], jnp.asarray(x))
    normal = np.asarray(out[..., :3])
    return ((normal + 1.0) * 0.5).clip(0.0, 1.0).astype(np.float32)
