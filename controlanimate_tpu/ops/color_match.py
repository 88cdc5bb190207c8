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
