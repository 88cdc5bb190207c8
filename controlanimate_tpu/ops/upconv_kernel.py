"""Pallas conv kernels for the RealESRGAN up-stage's small-channel convs.

VERDICT r4 next #1: the 2048^2 x 64ch conv family (conv_up1/up2/hr of the
RRDBNet x4 tail) is the dominant device cost of every shipped `upscale: 4`
profile (reference SampleConfigLCM*.yaml; RRDB geometry from
reference modules/upscaler.py:25) and XLA lowers it ~10x off the analytic
roofline (perf/upchunk_r4.json, perf/rdbform_r4.json: the s2d body is
MXU-bound, the up-stage is not).

Design (one kernel, two weight layouts):

  * im2col-as-matmul: each (row-block, col-chunk) tile becomes ONE
    (R*Wc, 9*Ci) @ (9*Ci, N) MXU matmul with f32 accumulation — at Ci=64
    the contraction dim is 576 (vs 64 for the naive 9-dot form, which
    wastes 3/4 of the MXU's 128-deep systolic array on padding).
  * the whole (R+2)-row strip stays VMEM-resident at full width; column
    chunks im2col out of it in-register, so column halos cost no extra
    HBM traffic and the pallas grid pipeline double-buffers the row strips
    automatically.
  * `upsample2x_conv3x3_s2d`: the nearest-2x+conv3x3 composite
    (ops/upsample.py parity decomposition, exact) is folded into a
    (9*Ci, 4*Co) weight matrix whose output channels are the four output
    parities in space-to-depth order — K=576 and N=256 are both
    lane-exact, the MAC count is identical to the parity form, and the 2x
    intermediate is never materialized. The caller depth-to-spaces once.
  * bias + leaky_relu fused into the matmul epilogue (the unfused lrelu
    passes were ~half the torch-literal RRDB's cost, perf/uptrace_r4.log).

The kernel body avoids pl.program_id (border masking comes in as a tiny
per-rowblock input) so it runs under the plain HLO interpreter on CPU —
tests pin exactness against the XLA forms there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(H: int, W: int, Ci: int, N: int, itemsize: int,
                budget: int = 10 * 1024 * 1024) -> tuple[int, int]:
    """(rows per block, cols per chunk): largest row-block (divisor of H)
    whose strip + patch + accumulator estimate fits the VMEM budget."""
    Wc = min(W, 256)
    while W % Wc:
        Wc //= 2
    for R in (16, 8, 4, 2, 1):
        if H % R:
            continue
        est = (
            2 * (R + 2) * (W + 2) * Ci * itemsize  # strip + padded strip
            + R * Wc * 9 * Ci * itemsize           # im2col chunk
            + R * Wc * N * 4                       # f32 accumulator
            + 2 * R * W * N * itemsize             # out block (double-buffered)
            + 9 * Ci * N * itemsize                # weights
        )
        if est <= budget:
            return R, Wc
    return 1, Wc


def _kernel(x_main, x_top, x_bot, wmat, bias, edge_ref, o_ref,
            *, rows: int, cols: int, act: str | None, emit: str | None = None):
    R, Wc = rows, cols
    z = jnp.concatenate([x_top[0], x_main[0], x_bot[0]], axis=0)  # (R+2, W, Ci)
    # conv zero padding: blank halo rows at the image border
    top_keep = edge_ref[0, 0, 0]
    bot_keep = edge_ref[0, 0, 1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R + 2, 1, 1), 0)
    keep = jnp.where(row_ids == 0, top_keep,
                     jnp.where(row_ids == R + 1, bot_keep, 1.0))
    z = z * keep.astype(z.dtype)
    # one zero column each side: plain-conv SAME padding (and the parity
    # form's p/q=0 left/top taps)
    zc = jnp.zeros_like(z[:, :1, :])
    zp = jnp.concatenate([zc, z, zc], axis=1)  # (R+2, W+2, Ci)

    _, W2, Ci = zp.shape
    W = W2 - 2
    N = wmat.shape[-1]
    for c0 in range(0, W, Wc):
        patches = jnp.concatenate(
            [zp[dy:dy + R, c0 + dx:c0 + dx + Wc].reshape(R * Wc, Ci)
             for dy in range(3) for dx in range(3)],
            axis=-1,
        )  # (R*Wc, 9*Ci) — tap order (dy-major, dx-fast) matches wmat rows
        acc = jax.lax.dot_general(
            patches, wmat[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias[0][None, :].astype(jnp.float32)
        if act == "lrelu":
            acc = jnp.where(acc >= 0, acc, 0.2 * acc)
        y = acc.reshape(R, Wc, N).astype(o_ref.dtype)
        if emit == "rows":
            # s2d columns are (py, px, co): the two py halves are
            # lane-aligned channel slices; storing them to the output's
            # explicit py axis leaves fine layout one reshape away (the
            # caller pays the px-lane relayout in XLA).
            half = N // 2
            o_ref[0, :, 0, c0:c0 + Wc, :] = y[:, :, :half]
            o_ref[0, :, 1, c0:c0 + Wc, :] = y[:, :, half:]
        elif emit == "fine":
            # full in-VMEM d2s on the output tile: rows via a sublane
            # interleave, cols via a lane interleave — the store itself is
            # then plain fine layout and downstream XLA sees a native
            # (2H, 2W, Co) array (no relayout copies at all)
            half, Co = N // 2, N // 4
            rows = jnp.concatenate(
                [y[:, None, :, :half], y[:, None, :, half:]], axis=1,
            ).reshape(2 * R, Wc, half)
            fine = jnp.concatenate(
                [rows[:, :, None, :Co], rows[:, :, None, Co:]], axis=2,
            ).reshape(2 * R, 2 * Wc, Co)
            o_ref[0, :, 2 * c0:2 * (c0 + Wc), :] = fine
        else:
            o_ref[0, :, c0:c0 + Wc, :] = y


def _run(x: jnp.ndarray, wmat: jnp.ndarray, bias: jnp.ndarray,
         act: str | None, interpret: bool,
         emit: str | None = None) -> jnp.ndarray:
    B, H, W, Ci = x.shape
    N = wmat.shape[-1]
    R, Wc = _pick_tiles(H, W, Ci, N, x.dtype.itemsize)
    n_i = H // R
    edges = np.ones((n_i, 1, 128), np.float32)
    edges[0, 0, 0] = 0.0
    edges[n_i - 1, 0, 1] = 0.0
    kern = functools.partial(_kernel, rows=R, cols=Wc, act=act, emit=emit)
    if emit == "rows":
        out_spec = pl.BlockSpec((1, R, 2, W, N // 2),
                                lambda b, i: (b, i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, H, 2, W, N // 2), x.dtype)
    elif emit == "fine":
        out_spec = pl.BlockSpec((1, 2 * R, 2 * W, N // 4),
                                lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, 2 * H, 2 * W, N // 4), x.dtype)
    else:
        out_spec = pl.BlockSpec((1, R, W, N), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, H, W, N), x.dtype)
    return pl.pallas_call(
        kern,
        grid=(B, n_i),
        in_specs=[
            pl.BlockSpec((1, R, W, Ci), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Ci),
                         lambda b, i, R=R: (b, jnp.maximum(i * R - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Ci),
                         lambda b, i, R=R, H=H: (b, jnp.minimum(i * R + R, H - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Ci, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(64 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Ci * N,
            bytes_accessed=(B * H * W * (Ci + N) + 9 * Ci * N) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, x, x, wmat, bias.reshape(1, N).astype(jnp.float32), jnp.asarray(edges))


def conv3x3_small(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                  act: str | None = None, interpret: bool = False) -> jnp.ndarray:
    """y = [lrelu](conv3x3(x) + bias), stride 1, SAME zero padding.

    x: (B, H, W, Ci) NHWC; kernel: (3, 3, Ci, Co) HWIO. Built for the
    RRDBNet tail's Ci=Co=64 geometry (any Ci/Co works; use ops/conv_kernel
    for the >=128-channel VAE family where XLA already wins)."""
    Ci = x.shape[-1]
    Co = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, Ci), kernel.shape
    wmat = kernel.astype(x.dtype).reshape(9 * Ci, Co)
    return _run(x, wmat, bias, act, interpret)


def fold_upsample_kernel_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (9*Ci, 4*Co) parity-folded weight matrix whose
    output channels are (py, px, co) — space-to-depth order, matching
    models/upscaler._d2s. Tap slots follow ops/upsample.py exactly:
    parity p uses coarse row taps {i-1+p, i+p} = 3x3 slots {p, p+1}."""
    k = kernel.astype(jnp.float32)
    Ci, Co = k.shape[2], k.shape[3]

    def fold_rows(w, p):
        if p == 0:
            return jnp.stack([w[0], w[1] + w[2]], axis=0)
        return jnp.stack([w[0] + w[1], w[2]], axis=0)

    def fold_cols(w2, q):
        if q == 0:
            return jnp.stack([w2[:, 0], w2[:, 1] + w2[:, 2]], axis=1)
        return jnp.stack([w2[:, 0] + w2[:, 1], w2[:, 2]], axis=1)

    w4 = jnp.zeros((3, 3, Ci, 2, 2, Co), jnp.float32)
    for p in (0, 1):
        for q in (0, 1):
            kpq = fold_cols(fold_rows(k, p), q)  # (2, 2, Ci, Co)
            w4 = w4.at[p:p + 2, q:q + 2, :, p, q, :].set(kpq)
    return w4.reshape(9 * Ci, 4 * Co)


def upsample2x_conv3x3_s2d(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray, act: str | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    """conv3x3(nearest_2x(x)) with the output left in space-to-depth layout:
    returns (B, H, W, 4*Co) where channel (py, px, co) holds output pixel
    (2i+py, 2j+px, co). Exact vs ops/upsample.upsample2x_conv3x3 after
    d2s (same folded weights, f32 accumulation). K=9*Ci and N=4*Co are both
    lane-exact at Ci=Co=64 — the MXU runs this at rate where XLA's lowering
    of the lhs-dilated form does not (perf/upconv_r5.json)."""
    Ci = x.shape[-1]
    Co = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, Ci), kernel.shape
    wmat = fold_upsample_kernel_s2d(kernel).astype(x.dtype)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4)
    return _run(x, wmat, bias4, act, interpret)


def upsample2x_conv3x3_fine(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: jnp.ndarray, act: str | None = None,
                            interpret: bool = False,
                            via: str = "rows") -> jnp.ndarray:
    """conv3x3(nearest_2x(x)) -> (B, 2H, 2W, Co) in FINE layout.

    Same math as `upsample2x_conv3x3_s2d`, different store epilogue:
    via="rows" (default) writes the two row-parity halves to an explicit py
    axis and the caller reshapes (XLA pays a px-lane relayout, ~3ms/call at
    1024^2); via="fine" would do the full d2s inside the kernel's VMEM
    epilogue — exact under interpret, but Mosaic cannot lower the px lane
    interleave on real TPU ("Only 2D gather is supported", r5 probe) —
    don't retry without a Mosaic that lowers sub-lane concat/reshape."""
    B, H, W, Ci = x.shape
    Co = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, Ci), kernel.shape
    wmat = fold_upsample_kernel_s2d(kernel).astype(x.dtype)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4)
    if via == "fine":
        return _run(x, wmat, bias4, act, interpret, emit="fine")
    out = _run(x, wmat, bias4, act, interpret, emit="rows")
    return out.reshape(B, 2 * H, 2 * W, Co)


def d2s(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) s2d layout (py, px, c) -> (B, 2H, 2W, C)."""
    B, H, W, C4 = x.shape
    C = C4 // 4
    return x.reshape(B, H, W, 2, 2, C).transpose(
        0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, C)
