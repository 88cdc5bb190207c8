"""RetinaFace (ResNet-50) 5-point face landmark detector in Flax.

The reference's face enhancer (reference: modules/upscaler.py:53-74) builds
a GFPGANer, which internally runs facexlib's FaceRestoreHelper: RetinaFace
with a ResNet-50 backbone ('detection_Resnet50_Final.pth') detects faces and
their 5-point landmarks (conf threshold 0.97), and those landmarks drive the
FFHQ alignment that GFPGAN restoration quality depends on.

TPU-first restructurings vs the torch original:
  * every conv+BatchNorm pair is folded into a single biased conv at weight
    load (inference-only; the i3d port pattern) — the jitted network is a
    pure conv/relu/resize graph;
  * channels-last NHWC end to end;
  * the network forward is one jitted program per input resolution; prior
    generation, box/landmark decode and NMS run host-side in numpy (a few
    thousand anchors — not a TPU-shaped workload).

Only the resnet50 variant is ported (facexlib's default for GFPGAN); its
FPN/SSH channel width (256) puts every activation lane-exact on the TPU and
makes all activations plain ReLU (the torch code's leaky slope is 0.1 only
for the mobile0.25 variant's <=64-channel width).
"""

from __future__ import annotations

import functools
import math
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..weights import ingest

# detection input preprocessing (facexlib RetinaFace.detect_faces): float32
# BGR minus the ImageNet-caffe mean, no scaling
BGR_MEAN = (104.0, 117.0, 123.0)

# cfg_re50 constants
MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)


class _Bottleneck(nn.Module):
    """torchvision resnet50 bottleneck, BN folded into the convs."""

    mid: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.relu(nn.Conv(self.mid, (1, 1), name="conv1")(x))
        out = nn.relu(nn.Conv(self.mid, (3, 3), strides=self.stride,
                              padding=1, name="conv2")(out))
        out = nn.Conv(self.mid * 4, (1, 1), name="conv3")(out)
        if self.has_downsample:
            identity = nn.Conv(self.mid * 4, (1, 1), strides=self.stride,
                               name="downsample")(x)
        return nn.relu(out + identity)


class _ResNet50(nn.Module):
    """Returns (layer2, layer3, layer4) features — the cfg_re50
    return_layers {'layer2','layer3','layer4'} of the torch
    IntermediateLayerGetter."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(64, (7, 7), strides=2, padding=3, name="conv1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for li, (mid, blocks) in enumerate(
                [(64, 3), (128, 4), (256, 6), (512, 3)], start=1):
            for bi in range(blocks):
                x = _Bottleneck(
                    mid,
                    stride=2 if (bi == 0 and li > 1) else 1,
                    has_downsample=(bi == 0),
                    name=f"layer{li}_{bi}",
                )(x)
            if li >= 2:
                feats.append(x)
        return feats  # C3 (512ch, /8), C4 (1024ch, /16), C5 (2048ch, /32)


class _SSH(nn.Module):
    """SSH context module; concat of 3x3 / emulated-5x5 / emulated-7x7
    branches (torch key spelling preserved: conv7X7_2 but conv7x7_3)."""

    @nn.compact
    def __call__(self, x):
        c3 = nn.Conv(128, (3, 3), padding=1, name="conv3X3")(x)
        c5_1 = nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv5X5_1")(x))
        c5 = nn.Conv(64, (3, 3), padding=1, name="conv5X5_2")(c5_1)
        c7_2 = nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv7X7_2")(c5_1))
        c7 = nn.Conv(64, (3, 3), padding=1, name="conv7x7_3")(c7_2)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFaceNet(nn.Module):
    """x: (N, H, W, 3) BGR mean-subtracted float32 ->
    (boxes (N, A, 4), class logits (N, A, 2), landmarks (N, A, 10))."""

    num_anchors: int = 2

    @nn.compact
    def __call__(self, x):
        N = x.shape[0]
        c3, c4, c5 = _ResNet50(name="body")(x)

        # FPN (out 256): lateral 1x1 conv+act, nearest top-down merge, 3x3 smooth
        o1 = nn.relu(nn.Conv(256, (1, 1), name="fpn_output1")(c3))
        o2 = nn.relu(nn.Conv(256, (1, 1), name="fpn_output2")(c4))
        o3 = nn.relu(nn.Conv(256, (1, 1), name="fpn_output3")(c5))
        o2 = o2 + jax.image.resize(o3, o2.shape, "nearest")
        o2 = nn.relu(nn.Conv(256, (3, 3), padding=1, name="fpn_merge2")(o2))
        o1 = o1 + jax.image.resize(o2, o1.shape, "nearest")
        o1 = nn.relu(nn.Conv(256, (3, 3), padding=1, name="fpn_merge1")(o1))

        feats = [
            _SSH(name="ssh1")(o1),
            _SSH(name="ssh2")(o2),
            _SSH(name="ssh3")(o3),
        ]
        a = self.num_anchors
        # NHWC conv output reshape matches torch's permute(0,2,3,1).view:
        # rows ordered (i, j, anchor) — the PriorBox ordering
        box = jnp.concatenate(
            [nn.Conv(a * 4, (1, 1), name=f"bbox_head_{i}")(f).reshape(N, -1, 4)
             for i, f in enumerate(feats)], axis=1)
        cls = jnp.concatenate(
            [nn.Conv(a * 2, (1, 1), name=f"class_head_{i}")(f).reshape(N, -1, 2)
             for i, f in enumerate(feats)], axis=1)
        ldm = jnp.concatenate(
            [nn.Conv(a * 10, (1, 1), name=f"landmark_head_{i}")(f).reshape(N, -1, 10)
             for i, f in enumerate(feats)], axis=1)
        return box, cls, ldm


# ------------------------------------------------------------------ priors
@functools.lru_cache(maxsize=8)
def priors_for(height: int, width: int) -> np.ndarray:
    """(A, 4) normalized anchor (cx, cy, s_kx, s_ky) — PriorBox of cfg_re50.

    Ordering: level-major, then row-major cells, then min_sizes — matching
    the head-concat ordering of RetinaFaceNet."""
    out = []
    for sizes, step in zip(MIN_SIZES, STEPS):
        fh = math.ceil(height / step)
        fw = math.ceil(width / step)
        for i in range(fh):
            for j in range(fw):
                for m in sizes:
                    out.append([(j + 0.5) * step / width,
                                (i + 0.5) * step / height,
                                m / width, m / height])
    return np.asarray(out, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """SSD box decode (variances 0.1/0.2) -> (A, 4) corner form, normalized."""
    cxcy = priors[:, :2] + loc[:, :2] * VARIANCES[0] * priors[:, 2:]
    # clamp the log-size offset: real detections sit well inside +-10; the
    # clamp only guards float overflow on garbage logits (e.g. random init)
    wh = priors[:, 2:] * np.exp(np.clip(loc[:, 2:] * VARIANCES[1], -10.0, 10.0))
    return np.concatenate([cxcy - wh / 2.0, cxcy + wh / 2.0], axis=1)


def decode_landmarks(ldm: np.ndarray, priors: np.ndarray) -> np.ndarray:
    """(A, 10) -> (A, 10) normalized (x1,y1,...,x5,y5)."""
    pts = ldm.reshape(-1, 5, 2)
    out = priors[:, None, :2] + pts * VARIANCES[0] * priors[:, None, 2:]
    return out.reshape(-1, 10)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> list[int]:
    """Hard NMS (py_cpu_nms semantics: IoU over (area1+area2-inter) with
    +1 width/height, matching the torch detector exactly)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return keep


# ---------------------------------------------------------- weight mapping
def _fold_bn(sd: dict, conv_t: str, bn_t: str, eps: float = 1e-5) -> dict:
    """conv (no bias) + BatchNorm2d -> single biased conv (inference fold)."""
    w = ingest.conv_kernel(sd[f"{conv_t}.weight"])  # (kh, kw, I, O)
    g = np.asarray(sd[f"{bn_t}.weight"], np.float32)
    b = np.asarray(sd[f"{bn_t}.bias"], np.float32)
    mean = np.asarray(sd[f"{bn_t}.running_mean"], np.float32)
    var = np.asarray(sd[f"{bn_t}.running_var"], np.float32)
    s = g / np.sqrt(var + eps)
    return {"kernel": np.asarray(w, np.float32) * s, "bias": b - mean * s}


def retinaface_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    """facexlib detection_Resnet50_Final.pth state dict -> flax params
    (BN folded)."""
    # some releases prefix every key with 'module.'
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}

    def conv(t):  # plain biased conv (the heads)
        return {"kernel": ingest.conv_kernel(sd[f"{t}.weight"]),
                "bias": sd[f"{t}.bias"]}

    body: dict = {"conv1": _fold_bn(sd, "body.conv1", "body.bn1")}
    for li, blocks in enumerate([3, 4, 6, 3], start=1):
        for bi in range(blocks):
            t = f"body.layer{li}.{bi}"
            blk = {f"conv{c}": _fold_bn(sd, f"{t}.conv{c}", f"{t}.bn{c}")
                   for c in (1, 2, 3)}
            if bi == 0:
                blk["downsample"] = _fold_bn(
                    sd, f"{t}.downsample.0", f"{t}.downsample.1")
            body[f"layer{li}_{bi}"] = blk

    params: dict = {"body": body}
    for name in ("output1", "output2", "output3", "merge1", "merge2"):
        params[f"fpn_{name}"] = _fold_bn(sd, f"fpn.{name}.0", f"fpn.{name}.1")
    for i in (1, 2, 3):
        params[f"ssh{i}"] = {
            branch: _fold_bn(sd, f"ssh{i}.{branch}.0", f"ssh{i}.{branch}.1")
            for branch in ("conv3X3", "conv5X5_1", "conv5X5_2",
                           "conv7X7_2", "conv7x7_3")
        }
    for i in range(3):
        params[f"class_head_{i}"] = conv(f"ClassHead.{i}.conv1x1")
        params[f"bbox_head_{i}"] = conv(f"BboxHead.{i}.conv1x1")
        params[f"landmark_head_{i}"] = conv(f"LandmarkHead.{i}.conv1x1")
    return params


# ----------------------------------------------------------------- facade
class RetinaFaceDetector:
    """Checkpoint-gated detector facade.

    detect_faces(frame_rgb) -> (n, 15) float32 [x0 y0 x1 y1 score, 5x(x y)]
    sorted by descending score — the facexlib detect_faces contract the
    reference's FaceRestoreHelper consumes."""

    DEFAULT_PATH = "models/Upscalers/detection_Resnet50_Final.pth"

    def __init__(self, model_path: Optional[str] = None):
        path = Path(model_path or self.DEFAULT_PATH)
        if not path.exists():
            raise FileNotFoundError(f"RetinaFace weights not found at {path}")
        self.model = RetinaFaceNet()
        self.params = jax.device_put(
            retinaface_params_from_torch(ingest.load_state_dict(path)))
        self._jit = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    def detect_faces(
        self,
        frame_rgb: np.ndarray,
        conf_threshold: float = 0.97,
        nms_threshold: float = 0.4,
    ) -> np.ndarray:
        frame_rgb = np.asarray(frame_rgb)
        H, W = frame_rgb.shape[:2]
        x = frame_rgb[..., ::-1].astype(np.float32) - np.asarray(BGR_MEAN, np.float32)
        box, cls, ldm = self._jit(self.params, jnp.asarray(x[None]))
        box, cls, ldm = (np.asarray(t[0], np.float32) for t in (box, cls, ldm))
        conf = np.exp(cls[:, 1] - cls.max(axis=1))
        conf = conf / (conf + np.exp(cls[:, 0] - cls.max(axis=1)))  # softmax[:, 1]
        priors = priors_for(H, W)
        keep = conf > conf_threshold
        if not keep.any():
            return np.zeros((0, 15), np.float32)
        boxes = decode_boxes(box[keep], priors[keep]) * np.array(
            [W, H, W, H], np.float32)
        landms = decode_landmarks(ldm[keep], priors[keep]) * np.tile(
            np.array([W, H], np.float32), 5)
        scores = conf[keep]
        order = scores.argsort()[::-1]
        boxes, landms, scores = boxes[order], landms[order], scores[order]
        sel = nms(boxes, scores, nms_threshold)
        return np.concatenate(
            [boxes[sel], scores[sel, None], landms[sel]], axis=1)
