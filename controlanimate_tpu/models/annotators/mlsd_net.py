"""MLSD (MobileV2_MLSD_Large) line-segment detector in Flax.

Parity with controlnet_aux's MLSDdetector torch model (reference:
modules/controlresiduals_pipeline.py:56-62): MobileNetV2 trunk with FPN taps
at features [1,3,6,10,13], BlockTypeA/B/C decoder to a 16-channel tpMap at
half resolution, center-heatmap NMS + displacement decode to line segments.

BatchNorms are folded into the preceding convs at weight-load time, so the
Flax graph is pure convs (faster, no running-stat plumbing).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest

_CACHE: dict = {}


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


# MobileNetV2 features[0..13] spec: (expand, out_c, stride) per inverted
# residual; features[0] is the stem ConvBNReLU(4->32, s2).
_IR_SPEC = [
    (1, 16, 1),   # f1
    (6, 24, 2),   # f2
    (6, 24, 1),   # f3
    (6, 32, 2),   # f4
    (6, 32, 1),   # f5
    (6, 32, 1),   # f6
    (6, 64, 2),   # f7
    (6, 64, 1),   # f8
    (6, 64, 1),   # f9
    (6, 64, 1),   # f10
    (6, 96, 1),   # f11
    (6, 96, 1),   # f12
    (6, 96, 1),   # f13
]
_FPN_TAPS = [1, 3, 6, 10, 13]


class InvertedResidual(nn.Module):
    expand: int
    out_c: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        h = x
        idx = 0
        if self.expand != 1:
            h = relu6(nn.Conv(in_c * self.expand, (1, 1), use_bias=True, name=f"conv_{idx}")(h))
            idx += 1
        h = relu6(
            nn.Conv(
                h.shape[-1], (3, 3), strides=self.stride, padding=1,
                feature_group_count=h.shape[-1], use_bias=True, name=f"conv_{idx}",
            )(h)
        )
        idx += 1
        h = nn.Conv(self.out_c, (1, 1), use_bias=True, name=f"conv_{idx}")(h)
        if self.stride == 1 and in_c == self.out_c:
            return x + h
        return h


class BlockA(nn.Module):
    out1: int
    out2: int
    upscale: bool = True

    @nn.compact
    def __call__(self, a, b):
        b = nn.relu(nn.Conv(self.out2, (1, 1), name="conv1")(b))
        a = nn.relu(nn.Conv(self.out1, (1, 1), name="conv2")(a))
        if self.upscale:
            B, H, W, C = b.shape
            b = jax.image.resize(b, (B, H * 2, W * 2, C), "bilinear")
        return jnp.concatenate([a, b], axis=-1)


class BlockB(nn.Module):
    out_c: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(x.shape[-1], (3, 3), padding=1, name="conv1")(x))
        x = h + x
        return nn.Conv(self.out_c, (3, 3), padding=1, name="conv2")(x)


class BlockC(nn.Module):
    out_c: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(x.shape[-1], (3, 3), padding=5, kernel_dilation=5, name="conv1")(x))
        h = nn.relu(nn.Conv(x.shape[-1], (3, 3), padding=1, name="conv2")(h))
        return nn.Conv(self.out_c, (1, 1), name="conv3")(h)


class MLSDLarge(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, 512, 512, 4) normalized; returns tpMap (B, 256, 256, 16)."""
        taps = {}
        h = relu6(nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=True, name="stem")(x))
        for i, (e, c, s) in enumerate(_IR_SPEC, start=1):
            h = InvertedResidual(e, c, s, name=f"ir_{i}")(h)
            if i in _FPN_TAPS:
                taps[i] = h
        c1, c2, c3, c4, c5 = (taps[i] for i in _FPN_TAPS)

        h = BlockA(64, 64, upscale=False, name="block15")(c4, c5)
        h = BlockB(64, name="block16")(h)
        h = BlockA(64, 64, name="block17")(c3, h)
        h = BlockB(64, name="block18")(h)
        h = BlockA(64, 64, name="block19")(c2, h)
        h = BlockB(64, name="block20")(h)
        h = BlockA(64, 64, name="block21")(c1, h)
        return BlockC(16, name="block22")(h)


# ------------------------------------------------------------ weight loading
def _fold_bn(conv_w, conv_b, bn_g, bn_b, bn_m, bn_v, eps=1e-5):
    """Fold BatchNorm into the preceding conv (torch OIHW weight in)."""
    scale = bn_g / np.sqrt(bn_v + eps)
    w = conv_w * scale[:, None, None, None]
    b = (conv_b if conv_b is not None else 0.0) * scale + bn_b - bn_m * scale
    return ingest.conv_kernel(w), b.astype(np.float32)


def mlsd_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    def fold(conv_prefix, bn_prefix):
        k, b = _fold_bn(
            np.asarray(sd[f"{conv_prefix}.weight"], np.float32),
            np.asarray(sd.get(f"{conv_prefix}.bias"), np.float32) if f"{conv_prefix}.bias" in sd else None,
            np.asarray(sd[f"{bn_prefix}.weight"], np.float32),
            np.asarray(sd[f"{bn_prefix}.bias"], np.float32),
            np.asarray(sd[f"{bn_prefix}.running_mean"], np.float32),
            np.asarray(sd[f"{bn_prefix}.running_var"], np.float32),
        )
        return {"kernel": k, "bias": b}

    params: dict = {}
    fx = "backbone.features"
    params["stem"] = fold(f"{fx}.0.0", f"{fx}.0.1")
    for i, (e, c, s) in enumerate(_IR_SPEC, start=1):
        entry: dict = {}
        if e == 1:
            # conv = [ConvBNReLU(dw)[0], conv(1), bn(2)]
            entry["conv_0"] = fold(f"{fx}.{i}.conv.0.0", f"{fx}.{i}.conv.0.1")
            entry["conv_1"] = fold(f"{fx}.{i}.conv.1", f"{fx}.{i}.conv.2")
        else:
            # conv = [ConvBNReLU(expand)[0], ConvBNReLU(dw)[1], conv(2), bn(3)]
            entry["conv_0"] = fold(f"{fx}.{i}.conv.0.0", f"{fx}.{i}.conv.0.1")
            entry["conv_1"] = fold(f"{fx}.{i}.conv.1.0", f"{fx}.{i}.conv.1.1")
            entry["conv_2"] = fold(f"{fx}.{i}.conv.2", f"{fx}.{i}.conv.3")
        params[f"ir_{i}"] = entry

    for name, (torch_name, convs) in {
        "block15": ("block15", [("conv1", "conv1"), ("conv2", "conv2")]),
        "block17": ("block17", [("conv1", "conv1"), ("conv2", "conv2")]),
        "block19": ("block19", [("conv1", "conv1"), ("conv2", "conv2")]),
        "block21": ("block21", [("conv1", "conv1"), ("conv2", "conv2")]),
    }.items():
        params[name] = {
            f: fold(f"{torch_name}.{t}.0", f"{torch_name}.{t}.1") for f, t in convs
        }
    for name in ("block16", "block18", "block20"):
        params[name] = {
            "conv1": fold(f"{name}.conv1.0", f"{name}.conv1.1"),
            "conv2": fold(f"{name}.conv2.0", f"{name}.conv2.1"),
        }
    params["block22"] = {
        "conv1": fold("block22.conv1.0", "block22.conv1.1"),
        "conv2": fold("block22.conv2.0", "block22.conv2.1"),
        "conv3": {
            "kernel": ingest.conv_kernel(np.asarray(sd["block22.conv3.weight"], np.float32)),
            "bias": np.asarray(sd["block22.conv3.bias"], np.float32),
        },
    }
    return params


# ------------------------------------------------------------------- decode
def decode_lines(tp_map: np.ndarray, score_thr=0.10, dist_thr=20.0, topk=200):
    """tpMap (256, 256, 16) -> line segments at the 512 scale."""
    from scipy.ndimage import maximum_filter

    center = tp_map[:, :, 0]
    disp = tp_map[:, :, 1:5]
    heat = 1.0 / (1.0 + np.exp(-center))
    hmax = maximum_filter(heat, size=5, mode="constant")
    heat = np.where(heat == hmax, heat, 0.0)
    flat = heat.ravel()
    idx = np.argpartition(flat, -topk)[-topk:]
    scores = flat[idx]
    yy, xx = np.unravel_index(idx, heat.shape)
    lines = []
    for x, y, s in zip(xx, yy, scores):
        if s < score_thr:
            continue
        dx1, dy1, dx2, dy2 = disp[y, x]
        x1, y1 = x + dx1, y + dy1
        x2, y2 = x + dx2, y + dy2
        if np.hypot(x2 - x1, y2 - y1) <= dist_thr / 2.0:
            continue
        lines.append((2 * x1, 2 * y1, 2 * x2, 2 * y2))
    return lines


def run(frames: np.ndarray, weight_file: Path) -> np.ndarray:
    import cv2

    key = str(weight_file)
    if key not in _CACHE:
        sd = ingest.load_state_dict(weight_file)
        model = MLSDLarge()
        params = mlsd_params_from_torch(sd)
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _CACHE[key] = (fn, jax.device_put(params))
    fn, params = _CACHE[key]

    F, H, W, _ = frames.shape
    x = np.stack([cv2.resize(f, (512, 512), interpolation=cv2.INTER_AREA) for f in frames])
    x = np.concatenate([x, np.full((F, 512, 512, 1), 255.0)], axis=-1)
    x = x.astype(np.float32) / 127.5 - 1.0
    tp = np.asarray(fn(params, jnp.asarray(x)))

    out = []
    for i in range(F):
        canvas = np.zeros((512, 512), np.uint8)
        for (x1, y1, x2, y2) in decode_lines(tp[i]):
            cv2.line(canvas, (int(x1), int(y1)), (int(x2), int(y2)), 255, 1)
        canvas = cv2.resize(canvas, (W, H), interpolation=cv2.INTER_NEAREST)
        out.append(np.repeat(canvas[:, :, None], 3, axis=2))
    return np.stack(out).astype(np.float32) / 255.0
