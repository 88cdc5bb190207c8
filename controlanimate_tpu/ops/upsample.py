"""Fused nearest-2x-upsample + 3x3 conv via parity decomposition.

The SD VAE decoder and the UNet's up blocks run `resize(nearest, 2x)` then a
3x3 stride-1 conv (reference: diffusers Upsample2D / animatediff resnet.py
Upsample3D :34-82). Because nearest upsampling only duplicates pixels, the
composite equals (exactly, in real arithmetic) four 2x2 convolutions on the
HALF-resolution input — one per output parity (p, q) — with weights folded
from the 3x3 kernel:

  out[2i+p, 2j+q] = sum_{dy,dx} w[dy,dx] * x[(2i+p+dy-1)//2, (2j+q+dx-1)//2]

  rows, p=0: taps {i-1: w[0], i: w[1]+w[2]}   (pad top)
  rows, p=1: taps {i: w[0]+w[1], i+1: w[2]}   (pad bottom)
  (columns identically)

That is 4*(2*2)=16 half-res taps instead of 9 full-res taps -> 4/9 of the
MACs, and the 2x-upsampled activation (2.1 GB at the decoder's 512^2 level,
16 frames) is never materialized. The three decoder upsample convs are ~11
of its ~20 TFLOPs, so this is the decode path's single biggest algebraic
saving.

Two equivalent formulations are provided (CONTROLANIMATE_UPSAMPLE_FORM):
'transposed' (default) hands XLA ONE lhs-dilated convolution with a 4x4
parity-folded kernel; 'parity' runs the four 2x2 convs and interleaves the
outputs explicitly. The math and MAC count are identical, but the explicit
interleave made XLA materialize full-resolution concatenates + a layout
copy (~64 ms of the 385 ms F=24 VAE decode in the v5e profiler trace);
the single-conv form measured 310.7 vs 412.4 ms back-to-back in-session.

f32 equality with the naive form is pinned by tests for both forms; in the
bf16 production path the folded weights round as bf16(w1+w2), which can
differ from the naive form's bf16(w1)x + bf16(w2)x by ~1 ulp of the weight
sum (and between forms by the same mechanism).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _form() -> str:
    """Which exact decomposition to use: 'transposed' (one lhs-dilated conv,
    4x4 folded kernel — default) or 'parity' (four 2x2 convs + explicit
    interleave). Same MACs either way; the parity form's interleave
    concatenates + layout copy were pure data movement XLA materialized at
    full resolution (profiled: ~64 ms of the 385 ms F=24 VAE decode; the
    transposed form measured 310.7 vs 412.4 ms back-to-back in-session)."""
    return os.environ.get("CONTROLANIMATE_UPSAMPLE_FORM", "transposed")


def _fold_rows(w, p):
    # w: (3, 3, Ci, Co) -> (2, 3, Ci, Co)
    if p == 0:
        return jnp.stack([w[0], w[1] + w[2]], axis=0)
    return jnp.stack([w[0] + w[1], w[2]], axis=0)


def _fold_cols(w2, q):
    # w2: (2, 3, Ci, Co) -> (2, 2, Ci, Co)
    if q == 0:
        return jnp.stack([w2[:, 0], w2[:, 1] + w2[:, 2]], axis=1)
    return jnp.stack([w2[:, 0] + w2[:, 1], w2[:, 2]], axis=1)


def upsample2x_conv3x3_transposed(x: jnp.ndarray, kernel: jnp.ndarray,
                                  bias: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Same composite as `upsample2x_conv3x3`, expressed as ONE lhs-dilated
    convolution (a stride-2 transposed conv with a 4x4 parity-folded kernel)
    instead of four parity convs + interleave concatenates.

    Folding (per spatial dim, cross-correlation indexing, pad_lo=2):
      out[p] = sum_a K[a] * z[p+a-2],  z = 2x-zero-stuffed x
      p even -> a in {0,2}: K[0]=w0,    K[2]=w1+w2
      p odd  -> a in {1,3}: K[1]=w0+w1, K[3]=w2
    so K = A @ w @ A^T with A = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]].

    Exact in real arithmetic (same MAC count as the parity form: each output
    pixel sees 2x2 taps); profiler-motivated: the parity form's interleave
    concatenates + layout copy were ~64 ms of the 385 ms F=24 VAE decode —
    pure data movement the single-conv form leaves to the conv emitter."""
    dt = dtype or x.dtype
    x = x.astype(dt)
    A = jnp.array([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], jnp.float32)
    k4 = jnp.einsum("ai,bj,ijco->abco", A, A, kernel.astype(jnp.float32))
    out = jax.lax.conv_general_dilated(
        x, k4.astype(dt), (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(dt)


def upsample2x_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                       dtype=None) -> jnp.ndarray:
    """x: (B, H, W, Ci); kernel: (3, 3, Ci, Co) HWIO; bias: (Co,).
    Returns conv3x3(nearest_2x(x)) of shape (B, 2H, 2W, Co), computed as
    four parity convs on x (exact, no upsampled intermediate)."""
    if _form() == "transposed":
        return upsample2x_conv3x3_transposed(x, kernel, bias, dtype)
    dt = dtype or x.dtype
    x = x.astype(dt)
    kernel = kernel.astype(jnp.float32)  # fold sums in f32, cast once after
    B, H, W, Ci = x.shape
    Co = kernel.shape[-1]

    ys = {}
    for p in (0, 1):
        wrows = _fold_rows(kernel, p)
        pad_r = (1, 0) if p == 0 else (0, 1)
        for q in (0, 1):
            k_pq = _fold_cols(wrows, q).astype(dt)
            pad_c = (1, 0) if q == 0 else (0, 1)
            ys[(p, q)] = jax.lax.conv_general_dilated(
                x, k_pq, (1, 1), (pad_r, pad_c),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
    # interleave parities: out[2i+p, 2j+q] = ys[(p,q)][i, j]
    row0 = jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=3).reshape(B, H, 2 * W, Co)
    row1 = jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=3).reshape(B, H, 2 * W, Co)
    out = jnp.stack([row0, row1], axis=2).reshape(B, 2 * H, 2 * W, Co)
    return out + bias.astype(dt)
