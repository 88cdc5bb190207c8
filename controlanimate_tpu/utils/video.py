"""Debug video writers.

`save_videos_grid` mirrors the reference's grid GIF dumper
(animatediff/utils/util.py:28-40: rearrange b c t h w -> t b c h w,
torchvision.make_grid per frame, imageio.mimsave) for this repo's
channels-last (B, F, H, W, C) arrays: per frame, tile the batch into a
row-major grid with the same 2px padding make_grid uses, then write an
animated GIF. Pure numpy + imageio — no torch on the path.
"""

from __future__ import annotations

import os

import numpy as np


def make_grid(images: np.ndarray, n_rows: int = 6, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile (B, H, W, C) float images into one (GH, GW, C) grid.

    `n_rows` is the number of images PER ROW (torchvision's confusingly
    named `nrow`, which the reference passes as n_rows=6, util.py:28-33);
    cells are separated and bordered by `padding` pixels of `pad_value`.
    """
    b, h, w, c = images.shape
    per_row = max(1, min(n_rows, b))
    rows = (b + per_row - 1) // per_row
    gh = rows * (h + padding) + padding
    gw = per_row * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, images.dtype)
    for i, img in enumerate(images):
        r, q = divmod(i, per_row)
        y = padding + r * (h + padding)
        x = padding + q * (w + padding)
        grid[y:y + h, x:x + w] = img
    return grid


def save_videos_grid(videos, path: str, rescale: bool = False,
                     n_rows: int = 6, fps: int = 8) -> None:
    """Write a batch of videos as one animated grid GIF.

    videos: (B, F, H, W, C), float in [0, 1] ([-1, 1] with rescale=True,
    util.py:34-35) or uint8. Parent directories are created like the
    reference does (util.py:39).
    """
    import imageio

    arr = np.asarray(videos)
    if arr.ndim != 5:
        raise ValueError(f"expected (B, F, H, W, C), got {arr.shape}")
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if rescale:
        arr = (arr + 1.0) / 2.0
    arr = np.clip(arr, 0.0, 1.0)

    frames = [
        (make_grid(arr[:, t], n_rows=n_rows) * 255).astype(np.uint8)
        for t in range(arr.shape[1])
    ]
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    # imageio >= 2.28 GIF writers take per-frame duration (ms), not fps
    imageio.mimsave(path, frames, duration=1000.0 / fps, loop=0)
