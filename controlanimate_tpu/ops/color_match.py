"""On-device color matching: histogram match -> MKL -> histogram match.

Capability parity with the reference's inter-batch color stabilization
(reference: modules/utils.py:116-130 — the `color_matcher` package with
method 'hm-mkl-hm', applied per output frame against the previous epoch's
anchor frame, called from scripts/vid2vid.py:216-220).

TPU-first: the reference round-trips every frame through numpy on host; here
the whole (F, H, W, 3) batch is matched in one jitted program — exact
sort-based histogram matching plus the Monge-Kantorovich linear transfer
(3x3 eigendecompositions, trivial for XLA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hist_match_channel(src: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Exact histogram matching of one flat channel to a reference channel
    of the same length (rank -> reference quantile)."""
    order = jnp.argsort(src)
    ranks = jnp.argsort(order)
    ref_sorted = jnp.sort(ref)
    return ref_sorted[ranks]


def hist_match(image: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, C) matched channel-wise to ref (H, W, C)."""
    H, W, C = image.shape[-3:]
    flat = image.reshape(-1, H * W, C)
    ref_flat = ref.reshape(H * W, C)
    matched = jax.vmap(  # over frames
        lambda img: jax.vmap(_hist_match_channel, in_axes=(1, 1), out_axes=1)(img, ref_flat)
    )(flat)
    return matched.reshape(image.shape)


def _sqrtm_psd(m: jnp.ndarray) -> jnp.ndarray:
    """Matrix square root of a small PSD matrix via eigh."""
    w, v = jnp.linalg.eigh(m)
    w = jnp.clip(w, 1e-10, None)
    return (v * jnp.sqrt(w)[None, :]) @ v.T


def _sqrtm_ns(a: jnp.ndarray, iters: int = 14) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(A^{1/2}, A^{-1/2}) for a small PSD matrix via Newton-Schulz iteration
    — pure matmuls, no eigendecomposition (XLA:TPU's eigh path is slow for
    tiny batched problems)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    norm = jnp.sqrt(jnp.sum(jnp.square(a))) + 1e-12
    y = a / norm
    z = eye

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return y @ t, t @ z

    y, z = jax.lax.fori_loop(0, iters, body, (y, z))
    s = jnp.sqrt(norm)
    return y * s, z / s


def mkl_transfer(image: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Monge-Kantorovich linear color transfer (Pitie & Kokaram 2007):
    x' = (x - mu_s) @ A + mu_r with
    A = C_s^{-1/2} (C_s^{1/2} C_r C_s^{1/2})^{1/2} C_s^{-1/2}."""
    src = image.reshape(-1, 3).astype(jnp.float32)
    dst = ref.reshape(-1, 3).astype(jnp.float32)
    mu_s, mu_r = src.mean(0), dst.mean(0)
    xs, xr = src - mu_s, dst - mu_r
    cov_s = xs.T @ xs / xs.shape[0] + 1e-8 * jnp.eye(3)
    cov_r = xr.T @ xr / xr.shape[0] + 1e-8 * jnp.eye(3)
    cs_half = _sqrtm_psd(cov_s)
    w, v = jnp.linalg.eigh(cov_s)
    w = jnp.clip(w, 1e-10, None)
    cs_inv_half = (v * (1.0 / jnp.sqrt(w))[None, :]) @ v.T
    middle = _sqrtm_psd(cs_half @ cov_r @ cs_half)
    A = cs_inv_half @ middle @ cs_inv_half
    out = xs @ A + mu_r
    return out.reshape(image.shape)


@jax.jit
def match_colors(frames: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """hm -> mkl -> hm pipeline over a frame batch.

    frames: (F, H, W, 3) float in [0,1]; ref: (H, W, 3).
    """
    frames = frames.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    x = hist_match(frames, ref)
    x = jax.vmap(lambda f: mkl_transfer(f, ref))(x)
    x = hist_match(x, ref)
    return jnp.clip(x, 0.0, 1.0)


_CDF_STRIDE = 4  # CDF estimation subsample: >=64k samples/channel at 512^2,
# so the 256-level CDF estimate is within ~1 LSB of exact while the compare
# volume drops 4x (the mapping itself stays exact per level)


def _cdf256(x_u8: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """256-level CDF of a flat uint8 channel, scatter-free: cdf[l] =
    mean(x <= l) via a broadcast compare reduced on the MXU (TPU scatters
    made the bincount formulation ~10x slower)."""
    xs = x_u8[::stride]
    n = xs.shape[0]
    levels = jnp.arange(256, dtype=xs.dtype)
    ind = (xs[:, None] <= levels[None, :]).astype(jnp.bfloat16)
    ones = jnp.ones((n,), jnp.bfloat16)
    counts = jnp.matmul(ones, ind, preferred_element_type=jnp.float32)
    return counts / n


def _lut_apply(lut: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Apply a 256-entry LUT to int32 values WITHOUT a gather: decompose the
    index into two nibbles and select via one-hot matmul + masked reduce —
    TPU gathers measured ~140ms for a 262k lookup, this form runs on the
    MXU/VPU. Exact for integer-valued LUTs."""
    hi = s >> 4
    lo = s & 15
    nib = jnp.arange(16, dtype=s.dtype)
    oh_hi = (hi[:, None] == nib[None, :]).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == nib[None, :]).astype(jnp.bfloat16)
    lut2d = lut.reshape(16, 16).astype(jnp.bfloat16)
    rows = jnp.matmul(oh_hi, lut2d, preferred_element_type=jnp.float32)  # (N, 16)
    return jnp.sum(rows * oh_lo.astype(jnp.float32), axis=-1)


def _hist_match_u8(
    image_u8: jnp.ndarray, ref_u8: jnp.ndarray, cdf_ref=None
) -> jnp.ndarray:
    """(F, H, W, 3) uint8 matched per-frame per-channel to ref (H, W, 3).

    cdf_ref (3, 256) can be precomputed once and shared across both
    histogram stages of the hm-mkl-hm pipeline."""
    F, H, W, C = image_u8.shape
    flat = image_u8.reshape(F, H * W, C).astype(jnp.int32)
    if cdf_ref is None:
        cdf_ref = _ref_cdfs(ref_u8)

    def per_frame(img):
        def per_chan(s, cdf_r):
            stride = _CDF_STRIDE if s.shape[0] >= 1 << 16 else 1
            cdf_s = _cdf256(s, stride)
            lut = jnp.clip(jnp.searchsorted(cdf_r, cdf_s), 0, 255)
            return _lut_apply(lut, s).astype(jnp.uint8)

        return jax.vmap(per_chan, in_axes=(1, 0), out_axes=1)(img, cdf_ref)

    return jax.vmap(per_frame)(flat).reshape(image_u8.shape)


def _ref_cdfs(ref_u8: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) uint8 -> (3, 256) exact per-channel CDFs."""
    ref_flat = ref_u8.reshape(-1, 3).astype(jnp.int32)
    return jax.vmap(_cdf256, in_axes=1)(ref_flat)


def _mkl_transfer_ns(image: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """MKL color transfer with Newton-Schulz square roots (eigh-free)."""
    src = image.reshape(-1, 3).astype(jnp.float32)
    dst = ref.reshape(-1, 3).astype(jnp.float32)
    mu_s, mu_r = src.mean(0), dst.mean(0)
    xs, xr = src - mu_s, dst - mu_r
    cov_s = xs.T @ xs / xs.shape[0] + 1e-6 * jnp.eye(3)
    cov_r = xr.T @ xr / xr.shape[0] + 1e-6 * jnp.eye(3)
    cs_half, cs_inv_half = _sqrtm_ns(cov_s)
    middle, _ = _sqrtm_ns(cs_half @ cov_r @ cs_half)
    A = cs_inv_half @ middle @ cs_inv_half
    out = xs @ A + mu_r
    return out.reshape(image.shape)


@jax.jit
def match_colors_u8(frames: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """uint8-in/uint8-out hm -> mkl -> hm, device-resident (the
    orchestrator's stitch path keeps frames on device between the decode and
    the final per-window readback). Histogram stages use exact 256-bin LUT
    matching; the MKL linear transfer stays in float (Newton-Schulz roots)."""
    ref = ref.astype(jnp.uint8)
    cdf_ref = _ref_cdfs(ref)  # shared by both histogram stages
    x = _hist_match_u8(frames.astype(jnp.uint8), ref, cdf_ref)
    xf = jax.vmap(lambda f: _mkl_transfer_ns(f, ref.astype(jnp.float32)))(x.astype(jnp.float32))
    x = jnp.clip(xf + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return _hist_match_u8(x, ref, cdf_ref)
