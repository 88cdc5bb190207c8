"""PidiNet (softedge) annotator in Flax — pixel-difference convolutions.

Parity with controlnet_aux's PidiNetDetector (table5_pidinet, 'carv4'
config; reference: modules/controlresiduals_pipeline.py:56-62 softedge).
The PDC variants are implemented as weight transforms at apply time:
  cv — plain conv
  cd — central difference: conv(w) - conv(sum(w) as 1x1)
  ad — angular difference: conv(w - w_rotated_clockwise)
  rd — radial difference: 5x5 kernel with the ring minus the inner ring
Backbone: stride-2 PDC stem, 4 stages x 4 depthwise-PDC blocks
(60/120/240/240 ch), CDCM dilation fusion + CSAM attention + per-scale
1-channel maps, 4->1 classifier, sigmoid.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest

_CACHE: dict = {}

CARV4 = ["cd", "ad", "rd", "cv"] * 4


def _pdc_weight(kind: str, w: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Transform an HWIO 3x3 kernel per PDC kind; returns (kernel, pad)."""
    kh, kw, ci, co = w.shape
    if kind == "cv":
        return w, 1
    if kind == "cd":
        center = jnp.zeros_like(w)
        center = center.at[1, 1].set(jnp.sum(w, axis=(0, 1)))
        return w - center, 1
    if kind == "ad":
        flat = w.reshape(9, ci, co)
        # clockwise rotation of the 3x3 taps (pidinet convention)
        rot = flat[jnp.asarray([3, 0, 1, 6, 4, 2, 7, 8, 5])]
        return (flat - rot).reshape(3, 3, ci, co), 1
    if kind == "rd":
        flat = w.reshape(9, ci, co)
        buf = jnp.zeros((25, ci, co), w.dtype)
        ring = jnp.asarray([0, 2, 4, 10, 14, 20, 22, 24])
        inner = jnp.asarray([6, 7, 8, 11, 13, 16, 17, 18])
        buf = buf.at[ring].set(flat[1:])
        buf = buf.at[inner].add(-flat[1:])
        return buf.reshape(5, 5, ci, co), 2
    raise ValueError(kind)


class PDCConv(nn.Module):
    """3x3 PDC conv (optionally depthwise / strided), bias-free."""

    kind: str
    features: int
    stride: int = 1
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        groups = ci if self.depthwise else 1
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, ci // groups, self.features),
        )
        wk, pad = _pdc_weight(self.kind, w)
        return jax.lax.conv_general_dilated(
            x, wk, (self.stride, self.stride), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )


class PDCBlock(nn.Module):
    kind: str
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        if self.stride > 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        y = PDCConv(self.kind, ci, depthwise=True, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv2")(y)
        if self.stride > 1:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return x + y


class CDCM(nn.Module):
    """Compact dilation conv module (dilations 5/7/9/11 summed)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), name="conv1")(x)
        outs = []
        for i, d in enumerate((5, 7, 9, 11)):
            outs.append(
                nn.Conv(
                    self.out_channels, (3, 3), padding=d, kernel_dilation=d,
                    use_bias=False, name=f"conv2_{i+1}",
                )(x)
            )
        return sum(outs)


class CSAM(nn.Module):
    """Compact spatial attention module."""

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(4, (1, 1), name="conv1")(y)
        y = nn.Conv(1, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        return x * jax.nn.sigmoid(y)


class PiDiNet(nn.Module):
    inplane: int = 60
    dil: int = 24

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0,1]; returns (B, H, W, 1) edge map [0,1]."""
        B, H, W, _ = x.shape
        p = self.inplane
        h = PDCConv(CARV4[0], p, stride=2, name="init_block")(x)
        scales = []
        ch = [p, p, 2 * p, 4 * p, 4 * p]
        li = 1
        for stage in range(1, 5):
            out_ch = ch[stage]
            n_blocks = 3 if stage == 1 else 4
            for b in range(n_blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                h = PDCBlock(
                    CARV4[li], out_ch, stride=stride, name=f"block{stage}_{b+1}"
                )(h)
                li += 1
            scales.append(h)

        maps = []
        for i, feat in enumerate(scales):
            f = CDCM(self.dil, name=f"dilations_{i}")(feat)
            f = CSAM(name=f"attentions_{i}")(f)
            m = nn.Conv(1, (1, 1), name=f"conv_reduces_{i}")(f)
            m = jax.image.resize(m, (B, H, W, 1), "bilinear")
            maps.append(m)
        out = nn.Conv(1, (1, 1), name="classifier")(jnp.concatenate(maps, axis=-1))
        return jax.nn.sigmoid(out)


def pidinet_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}

    def conv(t, bias=True):
        p = {"kernel": ingest.conv_kernel(sd[f"{t}.weight"])}
        if bias and f"{t}.bias" in sd:
            p["bias"] = sd[f"{t}.bias"]
        return p

    params: dict = {"init_block": {"kernel": ingest.conv_kernel(sd["init_block.weight"])}}
    li = 1
    for stage in range(1, 5):
        n_blocks = 3 if stage == 1 else 4
        for b in range(n_blocks):
            t = f"block{stage}_{b+1}"
            entry = {
                "conv1": {"kernel": ingest.conv_kernel(sd[f"{t}.conv1.weight"])},
                "conv2": conv(f"{t}.conv2", bias=False),
            }
            if f"{t}.shortcut.weight" in sd:
                entry["shortcut"] = conv(f"{t}.shortcut")
            params[t] = entry
            li += 1
    for i in range(4):
        params[f"dilations_{i}"] = {
            "conv1": conv(f"dilations.{i}.conv1"),
            **{f"conv2_{j+1}": conv(f"dilations.{i}.conv2_{j+1}", bias=False) for j in range(4)},
        }
        params[f"attentions_{i}"] = {
            "conv1": conv(f"attentions.{i}.conv1"),
            "conv2": conv(f"attentions.{i}.conv2", bias=False),
        }
        params[f"conv_reduces_{i}"] = conv(f"conv_reduces.{i}.conv")
    params["classifier"] = conv("classifier")
    return params


def run(frames: np.ndarray, weight_dir: Path) -> np.ndarray:
    weight_file = Path(weight_dir) / "table5_pidinet.pth"
    if not weight_file.exists():
        raise FileNotFoundError(f"pidinet needs weights at {weight_file}")
    key = str(weight_file)
    if key not in _CACHE:
        sd = ingest.load_state_dict(weight_file)
        model = PiDiNet()
        params = pidinet_params_from_torch(sd)
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _CACHE[key] = (fn, jax.device_put(params))
    fn, params = _CACHE[key]
    x = jnp.asarray(frames, jnp.float32) / 255.0
    y = np.asarray(fn(params, x))
    return np.repeat(y, 3, axis=-1).astype(np.float32)
