"""Overlap frame blending, on-device.

Capability parity with the reference's pixel-space stitching
(reference: scripts/vid2vid.py:225-227): overlap slot i of the new window is
alpha-blended with the previous epoch's version using
alpha_i = (n - i - 0.5) / n — earlier slots keep more of the previous epoch,
fading linearly toward the new content.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def blend_overlap(new_frames: jnp.ndarray, prev_frames: jnp.ndarray) -> jnp.ndarray:
    """new_frames: (K, H, W, 3) head of the current window;
    prev_frames: (K, H, W, 3) previous epoch's versions of those slots.
    Returns blended (K, H, W, 3): new*(1-a) + prev*a, a=(K-i-0.5)/K."""
    K = new_frames.shape[0]
    i = jnp.arange(K, dtype=jnp.float32)
    alpha = (K - i - 0.5) / K
    alpha = alpha[:, None, None, None]
    return new_frames * (1.0 - alpha) + prev_frames.astype(new_frames.dtype) * alpha


@jax.jit
def blend_overlap_u8(new_frames: jnp.ndarray, prev_frames: jnp.ndarray) -> jnp.ndarray:
    """uint8-in/uint8-out blend, device-resident (no host round trip)."""
    out = blend_overlap(new_frames.astype(jnp.float32), prev_frames.astype(jnp.float32))
    return jnp.clip(out + 0.5, 0.0, 255.0).astype(jnp.uint8)
