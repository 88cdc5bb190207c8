"""MLSD (line segment) annotator.

The reference uses the MLSDdetector torch model
(reference: modules/controlresiduals_pipeline.py:56-62 via controlnet_aux).
Here:
  * with local MLSD weights present, the full MobileNetV2+FPN Flax port
    runs (mlsd_net.py: BN-folded convs, center-heatmap NMS + displacement
    decode), and
  * without weights, a classical probabilistic-Hough line detector produces
    the same kind of condition map (white line segments on black), so the
    MLSD ControlNet path works out of the box in weight-less environments.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def hough_lines(frames: np.ndarray, score_thr: float = 0.1) -> np.ndarray:
    import cv2

    out = []
    for f in frames:
        gray = cv2.cvtColor(f, cv2.COLOR_RGB2GRAY)
        edges = cv2.Canny(gray, 50, 150)
        canvas = np.zeros_like(gray)
        lines = cv2.HoughLinesP(
            edges, 1, np.pi / 180, threshold=40, minLineLength=20, maxLineGap=8
        )
        if lines is not None:
            for line in np.asarray(lines).reshape(-1, 4):
                x1, y1, x2, y2 = (int(v) for v in line)
                cv2.line(canvas, (x1, y1), (x2, y2), 255, 1)
        out.append(np.repeat(canvas[:, :, None], 3, axis=2))
    return np.stack(out).astype(np.float32) / 255.0


def run(frames: np.ndarray, weight_dir: Path) -> np.ndarray:
    weight_file = Path(weight_dir) / "mlsd_large_512_fp32.pth"
    if weight_file.exists():
        from . import mlsd_net

        return mlsd_net.run(frames, weight_file)
    return hough_lines(frames)
