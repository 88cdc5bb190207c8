"""Fused AnimateDiff motion-module kernel for TPU.

One Pallas program per (batch, spatial-block) computes the ENTIRE temporal
transformer the reference runs as ~15 separate tensor ops
(reference: animatediff/models/motion_module.py:50-224):

    GroupNorm (folded affine) -> proj_in
    -> 2 x [ LayerNorm -> +PE -> frame-axis attention -> residual ]
    -> LayerNorm -> GEGLU FFN -> residual
    -> proj_out   (the OUTER residual is added by the caller in the
                   module's input dtype, matching the unfused path)

Measured on v5e (in-context, full UNet forward): the fused kernel is a
WASH vs XLA's op-by-op chain (205.9 vs 205.3 ms total forward) — XLA's
scheduler already keeps the chain at the same effective bandwidth — and the
fused program compiles ~3x slower. It therefore defaults OFF
(CONTROLANIMATE_PALLAS_MOTION=1 opts in); it remains useful as the
VMEM-resident formulation for future hardware where HBM:FLOP ratios shift,
and its tests pin the exact module numerics.

Frame-axis attention without lane-dim head splits: per-head logits come
from (nblk, C) @ block-diag-ones (C, H) segment-sum matmuls, and the
per-head probabilities are broadcast back to C lanes with the transposed
ones matrix — the MXU does the (de)interleaving that Mosaic reshapes can't.

Numerics match the unfused modules: f32 LN/GroupNorm statistics, f32
softmax over frames, f32 exact-erf GELU, bf16 matmul inputs with
f32 accumulation.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ENABLED = os.environ.get("CONTROLANIMATE_PALLAS_MOTION", "0") == "1"
# VMEM budget for weights + activations; level-0 (C=320) fits comfortably,
# level-1 (C=640) is allowed with a smaller spatial block
_VMEM_BUDGET = 24 * 1024 * 1024


def set_motion_kernel_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = bool(flag)


def motion_kernel_enabled() -> bool:
    return _ENABLED


def _ln(h, scale, bias, eps=1e-5):
    """LayerNorm32 semantics: f32 stats, input-dtype normalize/affine."""
    h32 = h.astype(jnp.float32)
    mean = jnp.mean(h32, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(h32), axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = inv.astype(h.dtype)
    b = (-mean * inv).astype(h.dtype)
    return (h * a + b) * scale + bias


def _erf_poly(z):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (|err| <= 1.5e-7)
    — Mosaic has no erf lowering, and 1.5e-7 is far below bf16 resolution."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(x):
    """Erf GELU with f32 math (diffusers GEGLU uses F.gelu exact; the
    polynomial erf differs by <=1.5e-7, below bf16 resolution)."""
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + _erf_poly(x32 / math.sqrt(2.0)))).astype(x.dtype)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _motion_kernel(
    x_ref, ga_ref, gb_ref, pe_ref, ones_ch_ref, ones_hc_ref,
    win_ref, bin_ref,
    ls0_ref, lb0_ref, wq0_ref, wk0_ref, wv0_ref, wo0_ref, ob0_ref,
    ls1_ref, lb1_ref, wq1_ref, wk1_ref, wv1_ref, wo1_ref, ob1_ref,
    lsf_ref, lbf_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    wout_ref, bout_ref,
    o_ref,
    *, heads: int, scale: float, use_pe: bool,
):
    x = x_ref[0]  # (F, nblk, C)
    F, nblk, C = x.shape
    dt = x.dtype

    # folded GroupNorm affine (per (frame, channel), stats precomputed;
    # blocks carry an explicit singleton spatial axis — Mosaic cannot fuse
    # a middle-axis expand into the block load)
    h = x * ga_ref[0] + gb_ref[0]
    # proj_in
    h = _dot(h.reshape(F * nblk, C), win_ref[:]).astype(dt) + bin_ref[0]
    h = h.reshape(F, nblk, C)

    attn_blocks = (
        (ls0_ref, lb0_ref, wq0_ref, wk0_ref, wv0_ref, wo0_ref, ob0_ref),
        (ls1_ref, lb1_ref, wq1_ref, wk1_ref, wv1_ref, wo1_ref, ob1_ref),
    )
    ones_ch = ones_ch_ref[:]  # (C, H) block-diag head segment-sum
    ones_hc = ones_hc_ref[:]  # (H, C) head -> lanes broadcast

    for ls, lb, wq, wk, wv, wo, ob in attn_blocks:
        z = _ln(h, ls[0], lb[0])
        if use_pe:
            z = z + pe_ref[:].astype(dt)
        zf = z.reshape(F * nblk, C)
        q = _dot(zf, wq[:]).astype(dt).reshape(F, nblk, C)
        k = _dot(zf, wk[:]).astype(dt).reshape(F, nblk, C)
        v32 = _dot(zf, wv[:]).reshape(F, nblk, C)  # f32 for the PV reduce

        out_rows = []
        for f in range(F):
            # logits over key frames for query frame f, per head:
            # elementwise q_f*k then segment-sum over each head's D lanes
            prod = (q[f][None, :, :] * k).astype(dt)           # (F, nblk, C)
            logits = _dot(prod.reshape(F * nblk, C), ones_ch)   # (F*nblk, H) f32
            logits = logits.reshape(F, nblk, heads) * scale
            m = jnp.max(logits, axis=0, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)           # softmax over g
            # broadcast per-head probs back to C lanes, weight V, sum over g
            p_exp = _dot(p.astype(dt).reshape(F * nblk, heads), ones_hc)
            out_f = jnp.sum(p_exp.reshape(F, nblk, C) * v32, axis=0)  # (nblk, C)
            out_rows.append(out_f.astype(dt))
        attn = jnp.stack(out_rows, axis=0).reshape(F * nblk, C)
        attn = _dot(attn, wo[:]).astype(dt) + ob[0]
        h = h + attn.reshape(F, nblk, C)

    # GEGLU feed-forward (f32 tanh-approx GELU), frame-chunked to bound VMEM
    z = _ln(h, lsf_ref[0], lbf_ref[0])
    ff_rows = []
    for f in range(F):
        g = _dot(z[f], w1_ref[:]).astype(dt) + b1_ref[0]   # (nblk, 2*inner)
        inner = g.shape[-1] // 2
        gg = g[:, :inner] * _gelu_f32(g[:, inner:])
        ff_rows.append(_dot(gg, w2_ref[:]).astype(dt) + b2_ref[0])
    h = h + jnp.stack(ff_rows, axis=0)

    out = _dot(h.reshape(F * nblk, C), wout_ref[:]).astype(dt) + bout_ref[0]
    # return the DELTA only: the caller adds the outer residual in the
    # module's input dtype, so fused and unfused paths promote identically
    o_ref[0] = out.reshape(F, nblk, C)


def _estimate_vmem(F: int, nblk: int, C: int, itemsize: int) -> int:
    act = F * nblk * C * itemsize
    # proj_in/out + 2 attn blocks (4 C^2 each) = 10 C^2; GEGLU w1 (C, 8C)
    # and w2 (4C, C)
    weights = (10 * C * C + C * 8 * C + 4 * C * C) * itemsize
    return 8 * act + weights


def pick_nblk(F: int, N: int, C: int, itemsize: int = 2) -> int | None:
    for nblk in (256, 128, 64, 32, 16, 8):
        if N % nblk:
            continue
        if _estimate_vmem(F, nblk, C, itemsize) <= _VMEM_BUDGET:
            return nblk
    return None


def motion_module_fused(
    x: jnp.ndarray,          # (B, F, N, C)
    p: dict,                 # flat param arrays, see motion_module.py caller
    *,
    heads: int,
    pe: np.ndarray | None,   # (F, C) positional table slice, or None
    nblk: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    if interpret is None:
        from .attention import _on_tpu

        interpret = not _on_tpu()
    B, F, N, C = x.shape
    H = heads
    D = C // H
    dt = x.dtype
    nblk = nblk or pick_nblk(F, N, C, dt.itemsize)
    assert nblk is not None and N % nblk == 0, (N, nblk)

    # head segment-sum / broadcast matrices (block-diagonal 0/1)
    ones_ch = np.zeros((C, H), np.float32)
    for hh in range(H):
        ones_ch[hh * D : (hh + 1) * D, hh] = 1.0
    ones_hc = jnp.asarray(ones_ch.T, dt)
    ones_ch = jnp.asarray(ones_ch, dt)

    pe_arr = (
        jnp.asarray(pe, jnp.float32).reshape(F, 1, C)
        if pe is not None
        else jnp.zeros((F, 1, C), jnp.float32)
    )

    def vec(a, n=None):
        return a.reshape(1, -1).astype(dt) if n is None else a.reshape(1, n).astype(dt)

    inputs = [
        x,
        p["gn_a"].astype(dt).reshape(B, F, 1, C),
        p["gn_b"].astype(dt).reshape(B, F, 1, C),
        pe_arr,                           # (F, 1, C)
        ones_ch, ones_hc,
        p["win"].astype(dt), vec(p["bin"]),
        vec(p["ls0"]), vec(p["lb0"]),
        p["wq0"].astype(dt), p["wk0"].astype(dt), p["wv0"].astype(dt),
        p["wo0"].astype(dt), vec(p["ob0"]),
        vec(p["ls1"]), vec(p["lb1"]),
        p["wq1"].astype(dt), p["wk1"].astype(dt), p["wv1"].astype(dt),
        p["wo1"].astype(dt), vec(p["ob1"]),
        vec(p["lsf"]), vec(p["lbf"]),
        p["w1"].astype(dt), vec(p["b1"]),
        p["w2"].astype(dt), vec(p["b2"]),
        p["wout"].astype(dt), vec(p["bout"]),
    ]

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda b, i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, F, nblk, C), lambda b, i: (b, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F, 1, C), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, F, 1, C), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM),
    ] + [full(a) for a in inputs[3:]]

    kern = functools.partial(
        _motion_kernel, heads=H, scale=float(D) ** -0.5, use_pe=pe is not None
    )
    inner = p["w1"].shape[1] // 2
    out = pl.pallas_call(
        kern,
        grid=(B, N // nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, F, nblk, C), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, N, C), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        cost_estimate=pl.CostEstimate(
            # GEMMs: proj_in/out (2C^2) + 2 attn blocks (4C^2 each) + GEGLU
            # (2C*inner) + net_2 (inner*C), per token; attention math extra
            flops=2 * B * F * N * (10 * C * C + 3 * inner * C + 4 * F * C),
            bytes_accessed=2 * B * F * N * C * dt.itemsize,
            transcendentals=B * F * N * (inner + 2 * F * heads),
        ),
        interpret=interpret,
    )(*inputs)
    return out
