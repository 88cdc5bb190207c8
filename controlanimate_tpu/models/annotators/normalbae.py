"""Surface-normal annotator.

The reference uses NormalBaeDetector (EfficientNet-B5 + NNET decoder,
reference: modules/controlresiduals_pipeline.py:56-62). The real Flax NNET
port lives in normalbae_net.py and runs whenever a scannet.pt checkpoint is
present; weights-absent fallbacks (in order):
  * depth-derived normals when a local depth model is available (finite
    differences of the depth map — geometrically meaningful), else
  * luminance-gradient pseudo-normals (documented approximation).
All paths emit the NormalBae RGB encoding (xyz -> [0,1]).
"""

from __future__ import annotations

import numpy as np


def _normals_from_height(height: np.ndarray, strength: float = 4.0) -> np.ndarray:
    import cv2

    gx = cv2.Sobel(height, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(height, cv2.CV_32F, 0, 1, ksize=3)
    n = np.stack([-gx * strength, -gy * strength, np.ones_like(height)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True).clip(1e-6)
    return ((n + 1.0) / 2.0).astype(np.float32)


def run(frames: np.ndarray) -> np.ndarray:
    try:
        from . import normalbae_net

        return normalbae_net.run(frames)
    except FileNotFoundError:
        pass
    try:
        from . import depth

        d = depth.run(frames)[..., 0]  # (F, H, W)
        return np.stack([_normals_from_height(di) for di in d])
    except FileNotFoundError:
        out = []
        for f in frames:
            import cv2

            lum = cv2.cvtColor(f, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
            lum = cv2.GaussianBlur(lum, (5, 5), 0)
            out.append(_normals_from_height(lum, strength=2.0))
        return np.stack(out)
