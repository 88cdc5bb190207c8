"""OpenPose body-pose annotator: CPM two-branch network in Flax + PAF
decode + skeleton rendering.

Parity with controlnet_aux's OpenposeDetector body path (reference:
modules/controlresiduals_pipeline.py:56-62,113 — the reference enables
hand_and_face; hand/face sub-models are tracked for a later round, the body
skeleton is the dominant conditioning signal).

Network: VGG19-derived feature trunk + 6 refinement stages with a PAF
(38ch) and keypoint-heatmap (19ch) branch. Decode: gaussian-smoothed peak
NMS, PAF line-integral limb matching, greedy person assembly, canonical
colored-skeleton rendering on black.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...weights import ingest

_CACHE: dict = {}

# (name, in, out, kernel) specs for the trunk (block0)
_BLOCK0 = [
    ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3), ("pool1", 0, 0, 0),
    ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3), ("pool2", 0, 0, 0),
    ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3), ("conv3_3", 256, 256, 3),
    ("conv3_4", 256, 256, 3), ("pool3", 0, 0, 0),
    ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
    ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
]

_LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
_MAP_IDX = [
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
    [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
    [53, 54], [51, 52], [55, 56], [37, 38], [45, 46],
]
_COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]


class BodyPoseNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) preprocessed (x/256 - 0.5, BGR);
        returns (paf (B,h,w,38), heat (B,h,w,19)) at stride 8."""
        h = x
        for name, _, out_ch, k in _BLOCK0:
            if name.startswith("pool"):
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.relu(nn.Conv(out_ch, (k, k), padding=k // 2, name=f"model0_{name}")(h))
        feat = h

        def stage1(branch: int, out_ch: int, h):
            p = f"model1_{branch}"
            for i in range(1, 4):
                h = nn.relu(nn.Conv(128, (3, 3), padding=1, name=f"{p}_conv5_{i}_CPM_L{branch}")(h))
            h = nn.relu(nn.Conv(512, (1, 1), name=f"{p}_conv5_4_CPM_L{branch}")(h))
            return nn.Conv(out_ch, (1, 1), name=f"{p}_conv5_5_CPM_L{branch}")(h)

        paf = stage1(1, 38, feat)
        heat = stage1(2, 19, feat)

        for stage in range(2, 7):
            inp = jnp.concatenate([paf, heat, feat], axis=-1)

            def refine(branch: int, out_ch: int, h):
                p = f"model{stage}_{branch}"
                for i in range(1, 6):
                    h = nn.relu(
                        nn.Conv(128, (7, 7), padding=3, name=f"{p}_Mconv{i}_stage{stage}_L{branch}")(h)
                    )
                h = nn.relu(nn.Conv(128, (1, 1), name=f"{p}_Mconv6_stage{stage}_L{branch}")(h))
                return nn.Conv(out_ch, (1, 1), name=f"{p}_Mconv7_stage{stage}_L{branch}")(h)

            paf = refine(1, 38, inp)
            heat = refine(2, 19, inp)
        return paf, heat


def body_params_from_torch(sd: dict[str, np.ndarray]) -> dict:
    """pytorch-openpose body_pose_model.pth -> flax params. Torch keys:
    model0.conv1_1.weight, model1_1.conv5_1_CPM_L1.weight,
    model2_1.Mconv1_stage2_L1.weight, ..."""
    params: dict = {}
    for k, v in sd.items():
        if not k.endswith(".weight") and not k.endswith(".bias"):
            continue
        mod, layer, kind = k.split(".")
        fname = f"{mod}_{layer}"
        entry = params.setdefault(fname, {})
        if kind == "weight":
            entry["kernel"] = ingest.conv_kernel(np.asarray(v))
        else:
            entry["bias"] = np.asarray(v)
    return params


# ---------------------------------------------------------------- decoding
def _find_peaks(heatmap: np.ndarray, thr: float = 0.1):
    from scipy.ndimage import gaussian_filter

    all_peaks = []
    peak_counter = 0
    for part in range(18):
        m = gaussian_filter(heatmap[:, :, part], sigma=3)
        up = np.zeros_like(m); up[1:] = m[:-1]
        down = np.zeros_like(m); down[:-1] = m[1:]
        left = np.zeros_like(m); left[:, 1:] = m[:, :-1]
        right = np.zeros_like(m); right[:, :-1] = m[:, 1:]
        binary = (m >= up) & (m >= down) & (m >= left) & (m >= right) & (m > thr)
        ys, xs = np.nonzero(binary)
        peaks = [
            (x, y, heatmap[y, x, part], peak_counter + i)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]
        peak_counter += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def _match_limbs(paf: np.ndarray, all_peaks, H: int):
    connection_all = []
    special_k = []
    mid_num = 10
    for k, (a, b) in enumerate(_MAP_IDX):
        score_mid = paf[:, :, [a - 19, b - 19]]
        candA = all_peaks[_LIMB_SEQ[k][0] - 1]
        candB = all_peaks[_LIMB_SEQ[k][1] - 1]
        if not candA or not candB:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for i, pa in enumerate(candA):
            for j, pb in enumerate(candB):
                vec = np.subtract(pb[:2], pa[:2]).astype(np.float64)
                norm = max(np.linalg.norm(vec), 1e-8)
                vecn = vec / norm
                xs = np.linspace(pa[0], pb[0], mid_num)
                ys = np.linspace(pa[1], pb[1], mid_num)
                scores = np.array([
                    score_mid[int(round(y)), int(round(x)), 0] * vecn[0]
                    + score_mid[int(round(y)), int(round(x)), 1] * vecn[1]
                    for x, y in zip(xs, ys)
                ])
                prior = scores.mean() + min(0.5 * H / norm - 1, 0)
                if (scores > 0.05).sum() > 0.8 * len(scores) and prior > 0:
                    candidates.append((i, j, prior, prior + pa[2] + pb[2]))
        candidates.sort(key=lambda c: c[2], reverse=True)
        connection = []
        usedA, usedB = set(), set()
        for i, j, s, _ in candidates:
            if i not in usedA and j not in usedB:
                connection.append([candA[i][3], candB[j][3], s, i, j])
                usedA.add(i)
                usedB.add(j)
        connection_all.append(connection)
    return connection_all, special_k


def _assemble_people(all_peaks, connection_all, special_k):
    candidate = np.array([p for peaks in all_peaks for p in peaks], dtype=np.float64)
    subset = -1 * np.ones((0, 20))
    for k in range(len(_MAP_IDX)):
        if k in special_k or not connection_all[k]:
            continue
        partAs = [c[0] for c in connection_all[k]]
        partBs = [c[1] for c in connection_all[k]]
        indexA, indexB = np.array(_LIMB_SEQ[k]) - 1
        for i, conn in enumerate(connection_all[k]):
            found = []
            for j in range(len(subset)):
                if subset[j][indexA] == partAs[i] or subset[j][indexB] == partBs[i]:
                    found.append(j)
            if len(found) == 1:
                j = found[0]
                if subset[j][indexB] != partBs[i]:
                    subset[j][indexB] = partBs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += candidate[int(partBs[i]), 2] + conn[2]
            elif len(found) == 2:
                j1, j2 = found
                membership = ((subset[j1] >= 0).astype(int) + (subset[j2] >= 0).astype(int))[:-2]
                if (membership == 2).sum() == 0:
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += conn[2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][indexB] = partBs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += candidate[int(partBs[i]), 2] + conn[2]
            elif k < 17:
                row = -1 * np.ones(20)
                row[indexA] = partAs[i]
                row[indexB] = partBs[i]
                row[-1] = 2
                row[-2] = candidate[int(partAs[i]), 2] + candidate[int(partBs[i]), 2] + conn[2]
                subset = np.vstack([subset, row])
    keep = [i for i in range(len(subset)) if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return candidate, subset[keep]


def draw_bodypose(canvas: np.ndarray, candidate: np.ndarray, subset: np.ndarray) -> np.ndarray:
    import cv2

    stickwidth = 4
    for i in range(17):
        for person in subset:
            idx = person[np.array(_LIMB_SEQ[i]) - 1]
            if -1 in idx:
                continue
            ys = candidate[idx.astype(int), 1]
            xs = candidate[idx.astype(int), 0]
            mx, my = xs.mean(), ys.mean()
            length = np.hypot(xs[0] - xs[1], ys[0] - ys[1])
            angle = np.degrees(np.arctan2(ys[0] - ys[1], xs[0] - xs[1]))
            poly = cv2.ellipse2Poly(
                (int(mx), int(my)), (int(length / 2), stickwidth), int(angle), 0, 360, 1
            )
            cv2.fillConvexPoly(canvas, poly, _COLORS[i])
    for i in range(18):
        for person in subset:
            idx = int(person[i])
            if idx == -1:
                continue
            x, y = candidate[idx][0:2]
            cv2.circle(canvas, (int(x), int(y)), 4, _COLORS[i], thickness=-1)
    return canvas


def run(frames: np.ndarray, weight_dir: Path) -> np.ndarray:
    import cv2

    weight_file = Path(weight_dir) / "body_pose_model.pth"
    if not weight_file.exists():
        raise FileNotFoundError(f"openpose needs weights at {weight_file}")
    key = str(weight_file)
    if key not in _CACHE:
        sd = ingest.load_state_dict(weight_file)
        model = BodyPoseNet()
        params = body_params_from_torch(sd)
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _CACHE[key] = (fn, jax.device_put(params))
    fn, params = _CACHE[key]

    F, H, W, _ = frames.shape
    scale = 0.5 * 368.0 / H
    h8 = int(np.ceil(H * scale / 8) * 8)
    w8 = int(np.ceil(W * scale / 8) * 8)
    batch = np.stack([
        cv2.resize(f, (w8, h8), interpolation=cv2.INTER_CUBIC) for f in frames
    ])
    # BGR + [-0.5, 0.5] preprocessing (pytorch-openpose convention)
    x = batch[..., ::-1].astype(np.float32) / 256.0 - 0.5
    paf8, heat8 = fn(params, jnp.asarray(x))
    paf8, heat8 = np.asarray(paf8), np.asarray(heat8)

    # hands (reference enables hand_and_face=True,
    # controlresiduals_pipeline.py:113); loads only if weights exist
    from .openpose_face import detect_and_draw_faces, load_face_net
    from .openpose_hand_face import detect_and_draw_hands, load_hand_net

    hand_net = load_hand_net(weight_dir)
    face_net = load_face_net(weight_dir)

    out = []
    for f_idx in range(F):
        heat = cv2.resize(heat8[f_idx], (W, H), interpolation=cv2.INTER_CUBIC)
        paf = cv2.resize(paf8[f_idx], (W, H), interpolation=cv2.INTER_CUBIC)
        peaks = _find_peaks(heat)
        conns, special = _match_limbs(paf, peaks, H)
        candidate, subset = _assemble_people(peaks, conns, special)
        canvas = np.zeros((H, W, 3), np.uint8)
        if len(candidate):
            canvas = draw_bodypose(canvas, candidate, subset)
            if hand_net is not None:
                canvas = detect_and_draw_hands(
                    canvas, frames[f_idx], candidate, subset, *hand_net
                )
            if face_net is not None:
                canvas = detect_and_draw_faces(
                    canvas, frames[f_idx], candidate, subset, *face_net
                )
        out.append(canvas)
    return np.stack(out).astype(np.float32) / 255.0
