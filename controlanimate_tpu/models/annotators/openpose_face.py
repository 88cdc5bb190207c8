"""OpenPose face sub-model (71-heatmap CPM) in Flax.

Completes hand_and_face=True parity (reference:
modules/controlresiduals_pipeline.py:113). Face regions are proposed from
body nose/eye/ear keypoints; landmarks render as white dots (the canonical
openpose face conditioning style).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest

_CACHE: dict = {}

_FACE_TRUNK = [
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool1", 0, 0),
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool2", 0, 0),
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
    ("conv3_4", 256, 3), ("pool3", 0, 0),
    ("conv4_1", 512, 3), ("conv4_2", 512, 3),
    ("conv5_1", 512, 3), ("conv5_2", 512, 3), ("conv5_3_CPM", 128, 3),
]


class FaceNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [-0.5, 0.5] BGR; returns (B, h, w, 71)."""
        h = x
        for name, ch, k in _FACE_TRUNK:
            if name.startswith("pool"):
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.relu(nn.Conv(ch, (k, k), padding=k // 2, name=name)(h))
        feat = h
        s = nn.relu(nn.Conv(512, (1, 1), name="conv6_1_CPM")(feat))
        out = nn.Conv(71, (1, 1), name="conv6_2_CPM")(s)
        for stage in range(2, 7):
            inp = jnp.concatenate([out, feat], axis=-1)
            h2 = inp
            for i in range(1, 6):
                h2 = nn.relu(
                    nn.Conv(128, (7, 7), padding=3, name=f"Mconv{i}_stage{stage}")(h2)
                )
            h2 = nn.relu(nn.Conv(128, (1, 1), name=f"Mconv6_stage{stage}")(h2))
            out = nn.Conv(71, (1, 1), name=f"Mconv7_stage{stage}")(h2)
        return out


def face_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    for k, v in sd.items():
        if not (k.endswith(".weight") or k.endswith(".bias")):
            continue
        layer, kind = k.rsplit(".", 1)
        layer = layer.replace("model.", "")
        entry = params.setdefault(layer, {})
        if kind == "weight":
            entry["kernel"] = ingest.conv_kernel(np.asarray(v))
        else:
            entry["bias"] = np.asarray(v)
    return params


def face_regions_from_body(candidate, subset, H: int, W: int):
    """Square face crops from nose/eye/ear keypoints (coco-18 indices:
    nose 0, eyes 14/15, ears 16/17)."""
    regions = []
    for person in subset:
        if person[0] < 0:
            continue
        nx, ny = candidate[int(person[0])][:2]
        dists = []
        for idx in (14, 15, 16, 17):
            if person[idx] >= 0:
                px, py = candidate[int(person[idx])][:2]
                dists.append(np.hypot(px - nx, py - ny))
        if not dists:
            continue
        width = 3.0 * max(dists)
        x0, y0 = int(max(nx - width / 2, 0)), int(max(ny - width / 2, 0))
        width = int(min(width, W - x0, H - y0))
        if width > 20:
            regions.append((x0, y0, width))
    return regions


def detect_and_draw_faces(canvas, frame, candidate, subset, fn, params):
    import cv2
    from scipy.ndimage import gaussian_filter

    H, W = frame.shape[:2]
    for (x0, y0, w) in face_regions_from_body(candidate, subset, H, W):
        crop = frame[y0:y0 + w, x0:x0 + w]
        if crop.size == 0:
            continue
        size = 368
        inp = cv2.resize(crop, (size, size), interpolation=cv2.INTER_CUBIC)
        x = inp[..., ::-1].astype(np.float32) / 256.0 - 0.5
        heat = np.asarray(fn(params, jnp.asarray(x[None])))[0]
        heat = cv2.resize(heat, (w, w), interpolation=cv2.INTER_CUBIC)
        for part in range(70):
            m = gaussian_filter(heat[:, :, part], sigma=3)
            y, xx = np.unravel_index(np.argmax(m), m.shape)
            if m[y, xx] < 0.1:
                continue
            cv2.circle(canvas, (x0 + xx, y0 + y), 3, (255, 255, 255), thickness=-1)
    return canvas


def load_face_net(weight_dir: Path):
    weight_file = Path(weight_dir) / "facenet.pth"
    if not weight_file.exists():
        return None
    key = str(weight_file)
    if key not in _CACHE:
        sd = ingest.load_state_dict(weight_file)
        model = FaceNet()
        params = face_params_from_torch(sd)
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _CACHE[key] = (fn, jax.device_put(params))
    return _CACHE[key]
