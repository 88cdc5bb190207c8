"""I3D (Inflated 3D Inception-v1) feature extractor for FVD.

The reference publishes no quantitative video-quality metric; BASELINE.md's
target ("matching reference SSIM/FVD") needs a Fréchet Video Distance,
whose canonical feature space is an I3D network trained on Kinetics-400
(Unterthiner et al., "Towards Accurate Generative Models of Video", 2018).
This is a channels-last Flax I3D matching the widely-used pytorch-i3d
checkpoint layout (piergiaj/pytorch-i3d, `rgb_imagenet.pt` /
`rgb_charades.pt` style state dicts: `Mixed_3b.b1a.conv3d.weight`,
`...bn.running_var`, ...), with every BatchNorm folded into its conv at
ingest — inference-only, one fused conv per Unit3D on the MXU.

Like every weights-gated component in this repo the Kinetics checkpoint is
absent in this environment: `scripts/eval_quality.py --fvd` gates on a
checkpoint path and falls back to a fixed-seed random-init I3D (documented
there; relative comparisons only).

Features = 1024-d global average pool of Mixed_5c, the standard FVD
embedding. The classifier `logits.*` keys are intentionally not consumed.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..weights import ingest


class Unit3D(nn.Module):
    """Conv3D + (folded) bias + ReLU. BN is folded into kernel/bias at
    ingest (`i3d_params_from_torch`), so inference is a single conv."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    strides: Sequence[int] = (1, 1, 1)
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, tuple(self.kernel), strides=tuple(self.strides),
            padding="SAME", name="conv3d", dtype=self.dtype,
        )(x)
        return nn.relu(x) if self.relu else x


class InceptionModule(nn.Module):
    """Four-branch Inception block, pytorch-i3d branch naming (b0, b1a/b1b,
    b2a/b2b, b3b after a 3x3x3 maxpool)."""

    out: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        o = self.out
        b0 = Unit3D(o[0], name="b0", dtype=self.dtype)(x)
        b1 = Unit3D(o[1], name="b1a", dtype=self.dtype)(x)
        b1 = Unit3D(o[2], (3, 3, 3), name="b1b", dtype=self.dtype)(b1)
        b2 = Unit3D(o[3], name="b2a", dtype=self.dtype)(x)
        b2 = Unit3D(o[4], (3, 3, 3), name="b2b", dtype=self.dtype)(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(o[5], name="b3b", dtype=self.dtype)(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


# (b0, b1a, b1b, b2a, b2b, b3b) per block — Inception-v1 table, the
# channel contract of every Kinetics I3D checkpoint
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class I3D(nn.Module):
    """Feature trunk through Mixed_5c -> global average pool (1024-d).

    Input: (B, T, H, W, 3) in [-1, 1], T >= 9 (two temporal halvings with
    SAME padding), spatial 224x224 for checkpoint-faithful features.
    `width` scales every channel count (tests use width<1 tiny nets; the
    checkpoint contract is width=1)."""

    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def _w(self, c: int) -> int:
        return max(1, int(round(c * self.width)))

    @nn.compact
    def __call__(self, x):
        w, dt = self._w, self.dtype
        x = Unit3D(w(64), (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7", dtype=dt)(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(w(64), name="Conv3d_2b_1x1", dtype=dt)(x)
        x = Unit3D(w(192), (3, 3, 3), name="Conv3d_2c_3x3", dtype=dt)(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        for name in ("Mixed_3b", "Mixed_3c"):
            x = InceptionModule(tuple(w(c) for c in _MIXED[name]), name=name, dtype=dt)(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(tuple(w(c) for c in _MIXED[name]), name=name, dtype=dt)(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        for name in ("Mixed_5b", "Mixed_5c"):
            x = InceptionModule(tuple(w(c) for c in _MIXED[name]), name=name, dtype=dt)(x)
        # global spatiotemporal average pool -> (B, C): the FVD embedding
        return x.mean(axis=(1, 2, 3)).astype(jnp.float32)


def _fold_bn(sd: dict, prefix: str) -> dict:
    """One Unit3D: conv3d.weight [+ bn stats] -> folded flax kernel/bias.

    pytorch-i3d convs carry no bias when followed by BN; the BN affine +
    running stats fold as kernel *= gamma/std, bias = beta - mean*gamma/std
    (eps 1e-3, the tf_slim default pytorch-i3d mirrors)."""
    kernel = ingest.conv_kernel(sd[f"{prefix}.conv3d.weight"])  # -> (t,h,w,i,o)
    bias = sd.get(f"{prefix}.conv3d.bias")
    if f"{prefix}.bn.running_var" in sd:
        gamma = sd[f"{prefix}.bn.weight"]
        beta = sd[f"{prefix}.bn.bias"]
        mean = sd[f"{prefix}.bn.running_mean"]
        var = sd[f"{prefix}.bn.running_var"]
        inv = gamma / np.sqrt(var + 1e-3)
        kernel = kernel * inv
        bias = (beta - mean * inv) + (bias * inv if bias is not None else 0.0)
    elif bias is None:
        bias = np.zeros(kernel.shape[-1], kernel.dtype)
    return {"conv3d": {"kernel": np.asarray(kernel, np.float32),
                       "bias": np.asarray(bias, np.float32)}}


def i3d_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    """pytorch-i3d state dict -> I3D(width=1) flax params (BN folded).

    Consumes every key except the Kinetics classifier head (`logits.*`),
    which FVD features never reach."""
    params: dict = {}
    consumed: set[str] = set()

    def unit(prefix: str) -> dict:
        for suf in ("conv3d.weight", "conv3d.bias", "bn.weight", "bn.bias",
                    "bn.running_mean", "bn.running_var",
                    "bn.num_batches_tracked"):
            if f"{prefix}.{suf}" in sd:
                consumed.add(f"{prefix}.{suf}")
        return _fold_bn(sd, prefix)

    for name in ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"):
        params[name] = unit(name)
    for name in _MIXED:
        params[name] = {b: unit(f"{name}.{b}") for b in ("b0", "b1a", "b1b", "b2a", "b2b")}
        params[name]["b3b"] = unit(f"{name}.b3b")
    leftover = [k for k in sd if k not in consumed and not k.startswith("logits.")]
    if leftover:
        raise ValueError(
            f"unrecognized I3D checkpoint keys (not pytorch-i3d layout?): "
            f"{sorted(leftover)[:5]}{'...' if len(leftover) > 5 else ''}"
        )
    return params
