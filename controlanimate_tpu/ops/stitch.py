"""Fused per-window stitch program.

One jitted device program for the whole post-decode chain the orchestrator
runs per window: color match (reference: scripts/vid2vid.py:216-220) ->
anchor/last-output slices (:220-223) -> overlap blending (:225-227) ->
emit slice -> optional YUV420 packing for the encoder. Fusing matters on
dispatch-latency-bound links (each loose jnp op is its own ~25ms round trip
through the remote-compile tunnel) and saves intermediate HBM traffic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blending import blend_overlap_u8
from .color_match import match_colors_u8
from .yuv import rgb_to_yuv420


def _stitch_window_impl(frames, anchor, prev_overlap, overlap_length, to_yuv, emit):
    """frames: (F, H, W, 3) uint8; anchor: (H, W, 3) or None;
    prev_overlap: (K, H, W, 3) or None.
    Returns (emitted_packed, new_anchor, last_output_frames, overlap_tail)."""
    if anchor is not None:
        frames = match_colors_u8(frames, anchor)
    new_anchor = frames[max(overlap_length - 1, -1)]
    last_out = frames[-overlap_length:] if overlap_length > 0 else None
    if prev_overlap is not None and prev_overlap.shape[0] > 0:
        K = prev_overlap.shape[0]
        head = blend_overlap_u8(frames[:K], prev_overlap)
        frames = jnp.concatenate([head, frames[K:]])
    tail = frames[-overlap_length:] if overlap_length > 0 else None
    emitted = frames[:emit]
    packed = rgb_to_yuv420(emitted) if to_yuv else emitted
    return packed, new_anchor, last_out, tail


stitch_window = jax.jit(
    _stitch_window_impl, static_argnames=("overlap_length", "to_yuv", "emit")
)


def _stitch_window_batch_impl(frames, anchor, prev_overlap, overlap_length, to_yuv, emit):
    """Segment-batched stitch (SURVEY §2.13: data-parallel video segments).

    frames: (S, F, H, W, 3) uint8 — one window per segment, lockstep;
    anchor: (S, H, W, 3) or None; prev_overlap: (S, K, H, W, 3) or None.
    Returns (emitted_packed, new_anchor, last_output_frames, overlap_tail),
    each with a leading segment axis. Per-segment semantics are identical BY
    CONSTRUCTION: this is the per-window impl vmapped over the segment axis
    (one source of truth — the exact property
    test_segment_parallel_matches_sequential_per_segment depends on)."""

    def body(f, a, p):
        return _stitch_window_impl(f, a, p, overlap_length, to_yuv, emit)

    return jax.vmap(body)(frames, anchor, prev_overlap)


stitch_window_batch = jax.jit(
    _stitch_window_batch_impl, static_argnames=("overlap_length", "to_yuv", "emit")
)
