"""Pallas fused GroupNorm+SiLU+3x3-conv kernel for the VAE's hot levels.

The VAE decoder/encoder spend most of their time in 3x3 convs at 512^2/256^2
spatial with 128-512 channels (reference decodes these frame-at-a-time,
controlanimation_pipeline.py:501-514; here they are batched AND fused).
XLA's conv on these geometries runs well off roofline and materializes the
normalized activation between GroupNorm and conv (an extra HBM round trip
per resnet branch). This kernel:

  - reads x once per row-block (plus 1-row halos), keeps it in VMEM,
  - applies the folded GroupNorm affine (per-(batch, channel) scale/shift,
    statistics computed by a cheap XLA reduction beforehand) and SiLU on
    the VMEM-resident block,
  - computes the 3x3 conv as 9 shifted (M, Cin) @ (Cin, Cout) matmuls with
    f32 accumulation (M = rows*width is MXU-friendly: thousands of rows),
  - optionally adds a residual (the resnet skip) before writing out.

Channel counts must be lane-aligned (multiples of 128): that covers every
VAE resnet/upsample conv except conv_in (3ch) and conv_out (3ch), which the
dispatcher leaves to XLA.

The kernel body avoids pl.program_id so it runs under the plain HLO
interpreter on CPU (the test oracle path); border-row zeroing comes in via a
tiny per-rowblock mask input instead.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = os.environ.get("CONTROLANIMATE_PALLAS_CONV", "0") == "1"


def set_conv_kernel_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = bool(flag)


def conv_kernel_enabled() -> bool:
    return _ENABLED


def _supported(H: int, W: int, Cin: int, Cout: int) -> bool:
    return (
        Cin % 128 == 0
        and Cout % 128 == 0
        and W % 8 == 0
        and H >= 2
        and W >= 16
    )


def _pick_rows(H: int, W: int, Cin: int, Cout_blk: int, itemsize: int,
               budget: int = 12 * 1024 * 1024) -> int:
    """Largest row-block (divisor of H) whose VMEM estimate fits the budget."""
    for R in (32, 16, 8, 4, 2, 1):
        if H % R:
            continue
        est = (
            3 * (R + 2) * W * Cin * itemsize  # activated block + two shifts
            + 9 * R * W * Cin * itemsize      # im2col patch buffer
            + R * W * Cin * itemsize          # x_main in-block
            + R * W * Cout_blk * 4            # f32 accumulator
            + R * W * Cout_blk * itemsize     # out block
            + 9 * Cin * Cout_blk * itemsize   # weights block
        )
        if est <= budget:
            return R
    return 1


def _conv_kernel(
    x_main, x_top, x_bot, wmat, bias, a_ref, b_ref, edge_ref, res_ref, o_ref,
    *, rows: int, act: str | None, has_affine: bool, has_residual: bool,
):
    R = rows
    z = jnp.concatenate([x_top[0], x_main[0], x_bot[0]], axis=0)  # (R+2, W, C)
    if has_affine:
        z = z * a_ref[0] + b_ref[0]  # (1, 1, Cin) blocks broadcast
    if act == "silu":
        # sigmoid via f32 (Mosaic's bf16 logistic lowering miscompiles a
        # broadcast; f32 VPU math then cast back is cheap and more accurate)
        z32 = z.astype(jnp.float32)
        z = (z32 * jax.nn.sigmoid(z32)).astype(z.dtype)
    # conv zero-padding applies AFTER normalization/activation: blank the
    # halo rows at the image border (edge mask: [top_keep, bot_keep])
    top_keep = edge_ref[0, 0, 0]
    bot_keep = edge_ref[0, 0, 1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R + 2, 1, 1), 0)
    keep = jnp.where(row_ids == 0, top_keep, jnp.where(row_ids == R + 1, bot_keep, 1.0))
    z = z * keep.astype(z.dtype)

    _, W, Cin = z.shape
    Cout_blk = o_ref.shape[-1]
    zeros_col = jnp.zeros_like(z[:, :1, :])
    left = jnp.concatenate([zeros_col, z[:, : W - 1, :]], axis=1)   # tap dx=0
    right = jnp.concatenate([z[:, 1:, :], zeros_col], axis=1)       # tap dx=2
    taps = (left, z, right)

    # im2col in VMEM: one (R*W, 9*Cin) @ (9*Cin, Cout) matmul instead of 9
    # small ones — the 9-dot form is MXU-launch-latency-bound at these tiles
    patches = jnp.concatenate(
        [taps[dx][dy : dy + R].reshape(R * W, Cin)
         for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # (R*W, 9*Cin), tap-major order matches wmat's row layout
    acc = jax.lax.dot_general(
        patches, wmat[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = acc + bias[0][None, :].astype(jnp.float32)
    if has_residual:
        acc = acc + res_ref[0].reshape(R * W, Cout_blk).astype(jnp.float32)
    o_ref[0] = acc.reshape(R, W, Cout_blk).astype(o_ref.dtype)


def conv3x3_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    affine: tuple[jnp.ndarray, jnp.ndarray] | None = None,
    act: str | None = None,
    residual: jnp.ndarray | None = None,
    rows_per_block: int | None = None,
    block_cout: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = conv3x3(act(x * a + b), kernel) + bias [+ residual].

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout) HWIO (flax nn.Conv layout);
    bias: (Cout,); affine: per-sample folded norm (a, b), each (B, Cin);
    act: None | 'silu'; residual: (B, H, W, Cout). Stride 1, SAME padding.
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, Cin), kernel.shape
    if not _supported(H, W, Cin, Cout):
        raise ValueError(f"unsupported conv geometry {(H, W, Cin, Cout)}")

    bc = min(block_cout or 256, Cout)
    while Cout % bc:
        bc //= 2
    R = rows_per_block or _pick_rows(H, W, Cin, bc, x.dtype.itemsize)
    assert H % R == 0, (H, R)
    n_i = H // R

    wmat = kernel.astype(x.dtype).reshape(9 * Cin, Cout)
    bias2 = bias.reshape(1, Cout).astype(jnp.float32)
    has_affine = affine is not None
    has_residual = residual is not None
    a2, b2 = affine if has_affine else (
        jnp.zeros((B, Cin), x.dtype), jnp.zeros((B, Cin), x.dtype)
    )
    # singleton middle axes keep Mosaic's block-shape rule happy (the last
    # two block dims must divide (8, 128) or equal the full array dims)
    a2 = a2.reshape(B, 1, Cin)
    b2 = b2.reshape(B, 1, Cin)
    res = residual if has_residual else jnp.zeros((B, 1, 1, Cout), x.dtype)
    # per-rowblock border mask: col 0 = keep top halo, col 1 = keep bottom
    edges = np.ones((n_i, 1, 128), np.float32)
    edges[0, 0, 0] = 0.0
    edges[n_i - 1, 0, 1] = 0.0
    edges = jnp.asarray(edges)

    kern = functools.partial(
        _conv_kernel, rows=R, act=act, has_affine=has_affine,
        has_residual=has_residual,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, n_i, Cout // bc),
        in_specs=[
            pl.BlockSpec((1, R, W, Cin), lambda b, i, j: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Cin),
                         lambda b, i, j, R=R: (b, jnp.maximum(i * R - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Cin),
                         lambda b, i, j, R=R, H=H: (b, jnp.minimum(i * R + R, H - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * Cin, bc), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda b, i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Cin), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, R, W, bc) if has_residual else (1, 1, 1, bc),
                (lambda b, i, j: (b, i, 0, j)) if has_residual
                else (lambda b, i, j: (b, 0, 0, j)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, R, W, bc), lambda b, i, j: (b, i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=(B * H * W * (Cin + Cout)
                            + 9 * Cin * Cout) * x.dtype.itemsize,
            transcendentals=B * H * W * Cin if act else 0,
        ),
        interpret=interpret,
    )(x, x, x, wmat, bias2, a2, b2, edges, res)
    return out


def conv3x3_xla(x, kernel, bias, affine=None, act=None, residual=None):
    """Reference XLA path with identical semantics (the numerics oracle and
    the fallback for unaligned geometries)."""
    h = x
    if affine is not None:
        a, b = affine
        h = h * a[:, None, None, :] + b[:, None, None, :]
    if act == "silu":
        h = jax.nn.silu(h)
    out = jax.lax.conv_general_dilated(
        h, kernel.astype(h.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias.astype(h.dtype)
    if residual is not None:
        out = out + residual
    return out


def groupnorm_fold(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """Fold GroupNorm statistics into per-(batch, channel) affine (a, b) so
    normalization can fuse into a following kernel. fp32 statistics,
    input-dtype application (matches models/layers.GroupNorm)."""
    B = x.shape[0]
    C = x.shape[-1]
    G = num_groups
    grouped = x.reshape(B, -1, G, C // G)
    mean = jnp.mean(grouped, axis=(1, 3), dtype=jnp.float32)  # (B, G)
    mean2 = jnp.mean(jnp.square(grouped.astype(jnp.float32)), axis=(1, 3),
                     dtype=jnp.float32)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (B, G)
    scale_g = scale.reshape(G, C // G).astype(jnp.float32)
    bias_g = bias.reshape(G, C // G).astype(jnp.float32)
    a = (scale_g[None] * inv[:, :, None]).reshape(B, C)
    b = (bias_g[None] - (mean * inv)[:, :, None] * scale_g[None]).reshape(B, C)
    return a.astype(x.dtype), b.astype(x.dtype)
