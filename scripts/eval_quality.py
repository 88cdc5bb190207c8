"""Video quality / parity evaluation harness.

The reference publishes no quantitative quality metrics (SURVEY §6) and its
stitching quality can only be judged visually. This tool computes the
metrics the BASELINE calls for when comparing against reference outputs
(SSIM/PSNR per frame + temporal-consistency score), over two videos or two
frame directories:

    python scripts/eval_quality.py <ours> <reference> [--max-frames N]

Prints one JSON line. Pure numpy — usable anywhere the frames are.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float64)


def _filter2(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Valid-mode 2D correlation via stride tricks (no scipy dependency)."""
    K = k.shape[0]
    H, W = img.shape
    s = img.strides
    windows = np.lib.stride_tricks.as_strided(
        img, shape=(H - K + 1, W - K + 1, K, K), strides=(s[0], s[1], s[0], s[1])
    )
    return np.einsum("ijkl,kl->ij", windows, k)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM of two uint8 RGB frames (Wang et al. 2004 constants,
    gaussian 11x11 window, computed per channel on float64)."""
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    k = _gaussian_kernel()
    vals = []
    for c in range(a.shape[-1]):
        x = a[..., c].astype(np.float64)
        y = b[..., c].astype(np.float64)
        mx = _filter2(x, k)
        my = _filter2(y, k)
        mxx = _filter2(x * x, k) - mx * mx
        myy = _filter2(y * y, k) - my * my
        mxy = _filter2(x * y, k) - mx * my
        s = ((2 * mx * my + C1) * (2 * mxy + C2)) / (
            (mx**2 + my**2 + C1) * (mxx + myy + C2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def temporal_consistency(frames: list[np.ndarray]) -> float:
    """Mean absolute inter-frame delta (lower = smoother video; the metric
    the overlap-stitching machinery exists to keep low across window
    boundaries)."""
    if len(frames) < 2:
        return 0.0
    deltas = [
        np.mean(np.abs(frames[i + 1].astype(np.float64) - frames[i].astype(np.float64)))
        for i in range(len(frames) - 1)
    ]
    return float(np.mean(deltas))


def load_frames(path: str, max_frames: int | None = None) -> list[np.ndarray]:
    """Frames from a video file (OpenCV) or a directory of numbered images."""
    p = Path(path)
    frames: list[np.ndarray] = []
    if p.is_dir():
        for f in sorted(p.iterdir()):
            if f.suffix.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            from PIL import Image

            frames.append(np.asarray(Image.open(f).convert("RGB"), np.uint8))
            if max_frames and len(frames) >= max_frames:
                break
        return frames
    import cv2

    cap = cv2.VideoCapture(str(p))
    try:
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            frames.append(bgr[..., ::-1].copy())
            if max_frames and len(frames) >= max_frames:
                break
    finally:
        cap.release()
    return frames


def evaluate(ours: list[np.ndarray], ref: list[np.ndarray]) -> dict:
    n = min(len(ours), len(ref))
    if n == 0:
        raise ValueError("no overlapping frames to compare")
    ssims = [ssim(ours[i], ref[i]) for i in range(n)]
    psnrs = [psnr(ours[i], ref[i]) for i in range(n)]
    return {
        "frames_compared": n,
        "ssim_mean": round(float(np.mean(ssims)), 5),
        "ssim_min": round(float(np.min(ssims)), 5),
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "temporal_ours": round(temporal_consistency(ours[:n]), 4),
        "temporal_ref": round(temporal_consistency(ref[:n]), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ours", help="video file or frame directory")
    ap.add_argument("reference", help="video file or frame directory")
    ap.add_argument("--max-frames", type=int, default=None)
    a = ap.parse_args()
    ours = load_frames(a.ours, a.max_frames)
    ref = load_frames(a.reference, a.max_frames)
    print(json.dumps(evaluate(ours, ref)))


if __name__ == "__main__":
    main()
