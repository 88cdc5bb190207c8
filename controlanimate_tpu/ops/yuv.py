"""On-device RGB <-> YUV420p (I420) conversion.

x264 consumes yuv420p; the reference pipes rgb24 and lets ffmpeg's swscale
convert on host (reference: scripts/vid2vid.py:123-136). Converting on
device halves the device->host readback (1.5 bytes/px vs 3) — the same
BT.601 limited-range matrix swscale applies to rgb24 input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def rgb_to_yuv420(frames: jnp.ndarray) -> jnp.ndarray:
    """(F, H, W, 3) uint8 RGB -> (F, H*W*3//2) uint8 planar I420
    (BT.601 limited range, 2x2-averaged chroma). H and W must be even."""
    f = frames.astype(jnp.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) / 256.0
    u = 128.0 + (-37.945 * r - 74.494 * g + 112.439 * b) / 256.0
    v = 128.0 + (112.439 * r - 94.154 * g - 18.285 * b) / 256.0
    F, H, W = y.shape
    u = u.reshape(F, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    v = v.reshape(F, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    packed = jnp.concatenate(
        [y.reshape(F, -1), u.reshape(F, -1), v.reshape(F, -1)], axis=1
    )
    return jnp.clip(packed + 0.5, 0.0, 255.0).astype(jnp.uint8)


def yuv420_to_rgb_host(buf: np.ndarray, height: int, width: int) -> np.ndarray:
    """Host-side inverse for tests: (F, H*W*3//2) uint8 I420 -> (F, H, W, 3)
    uint8 RGB (nearest chroma upsampling)."""
    buf = np.asarray(buf)
    F = buf.shape[0]
    n = height * width
    y = buf[:, :n].reshape(F, height, width).astype(np.float32)
    u = buf[:, n:n + n // 4].reshape(F, height // 2, width // 2).astype(np.float32)
    v = buf[:, n + n // 4:].reshape(F, height // 2, width // 2).astype(np.float32)
    u = u.repeat(2, axis=1).repeat(2, axis=2)
    v = v.repeat(2, axis=1).repeat(2, axis=2)
    c = y - 16.0
    d = u - 128.0
    e = v - 128.0
    r = (298.082 * c + 408.583 * e) / 256.0
    g = (298.082 * c - 100.291 * d - 208.120 * e) / 256.0
    b = (298.082 * c + 516.412 * d) / 256.0
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)
