"""Attention dispatch: XLA fused attention by default, Pallas flash kernels
on TPU for the hot shapes.

Replaces the reference's xformers/SDPA split (reference:
modules/controlanimate_pipeline.py:111-116 enables xformers only without
IP-Adapter; modules/attention_processor.py:454-472 uses torch SDPA).
Here a single entry point picks the best backend for the layout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Measured on v5e (r2, loop-in-jit x10 so dispatch floors cancel): for the
# UNet's hot spatial shape (16, 4096, 8, 40) XLA's fused attention wins —
# 9.9 ms/call vs our best Pallas flash variant 12.2 ms (one-pass softmax,
# full KV in VMEM; the D 40->128 lane padding costs both backends alike) and
# vs the STOCK jax.experimental TPU flash kernel 68-130 ms (tuned for LLM
# head dims). At (16, 1024, 8, 80) Pallas edges XLA (3.7 vs 4.3 ms) but the
# shape is minor. XLA is the default; the Pallas kernel remains available
# (set_pallas_enabled / CONTROLANIMATE_PALLAS_ATTENTION=1) — it compiles
# ~700x faster through the remote-compile tunnel, which matters for cold
# starts.
import os as _os

_PALLAS_ENABLED = _os.environ.get("CONTROLANIMATE_PALLAS_ATTENTION", "0") == "1"
_PALLAS_MIN_SEQ = 256  # below this XLA's fused attention is already optimal

# Auto-dispatch thresholds (independent of the force-flag above): at head
# dims >= 80 the 128-lane pad waste shrinks and the Pallas one-pass kernel
# wins on-chip — measured within one session: (16,1024,8,80) 3.2 vs 4.4 ms,
# VAE mid-attn (16,4096,1,512) 5.9 vs 10.8 ms; at D=40 XLA stays ahead.
# Re-validated at the PROGRAM level 8/19 (perf/eulerab_r4.json, valid A/B
# after the r3 force_flash fix): Euler 30-step denoise with flash forced at
# level-0 is 9.2% slower than XLA (12359 vs 11319 ms) — the table holds.
_PALLAS_AUTO_MIN_HEAD_DIM = 80
_PALLAS_AUTO_MIN_SEQ = 1024


def set_pallas_enabled(flag: bool) -> None:
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = bool(flag)


# trace-time memory-bounding context: XLA's fused attention materializes
# the (B·F, H, N, N) logits (8.6GB at 32 frames, 512px — OOMs a 16GB v5e);
# the engine wraps window tracing in force_flash() when the window geometry
# demands memory-bounded attention. A context (not a shape rule) because
# the same attention shape appears in Euler/CFG 16-frame windows, where the
# whole window fits and XLA's unbounded form is the measured-faster choice.
#
# Under the context, big shapes run the Pallas flash kernel. The obvious
# alternative — CHUNKED XLA attention (lax.map over batch chunks sized to a
# logits budget), keeping XLA's plain-form kernel that beats flash outside
# scans (9.9 vs 12.2 ms at (16,4096,8,40), r2) — was built and MEASURED
# 3.4x SLOWER in-scan on v5e (perf/hbmchunk_r4.json: 75.8 vs 22.3 ms/call
# at (32,4096,8,40), 112 vs 31.9 at (48,...)): inside lax.map/scan XLA
# loses the fusion that makes its unbounded form fast. Don't retry;
# `_chunked_xla_attention` below is kept as the measured-slower reference
# (exactness-tested) with the numbers.
_FLASH_CTX = [False]

# Chunked-XLA logits budget: F=24 windows materialize 6.4GB and run fine on
# a 16GB v5e alongside bf16 params; stay under that with headroom.
_LOGITS_BUDGET_BYTES = 5_000_000_000


def _chunked_xla_attention(q, k, v):
    """XLA fused attention over batch chunks small enough that one chunk's
    (c, H, N, N) logits fit the budget; lax.map serializes chunks so peak
    memory is a single chunk's. Exact — attention is independent per batch
    element. NOT dispatched to: measured 3.4x slower than the Pallas flash
    kernel in-scan (see the bounded_memory note above)."""
    B, N, H, _ = q.shape
    per_b = H * N * N * jnp.dtype(q.dtype).itemsize
    c = max(
        (d for d in range(1, B + 1) if B % d == 0 and d * per_b <= _LOGITS_BUDGET_BYTES),
        default=1,
    )
    if c == B:
        return jax.nn.dot_product_attention(q, k, v)
    shape = (B // c, c, *q.shape[1:])
    out = jax.lax.map(
        lambda t: jax.nn.dot_product_attention(*t),
        (q.reshape(shape), k.reshape(shape), v.reshape(shape)),
    )
    return out.reshape(q.shape)


class bounded_memory:
    """Trace-time context: attention shapes whose full logits exceed the
    budget run chunked XLA attention. Enter only when bounding (see the
    engine: a nested (False) would overwrite an outer (True) for the whole
    scan trace)."""

    def __init__(self, flag: bool = True):
        self.flag = bool(flag)

    def __enter__(self):
        self.prev = _FLASH_CTX[0]
        _FLASH_CTX[0] = self.flag
        return self

    def __exit__(self, *exc):
        _FLASH_CTX[0] = self.prev


# historical name (pre-r4 the context forced the Pallas flash kernel; it
# now bounds memory via chunked XLA, the measured-faster form)
force_flash = bounded_memory


def _on_tpu() -> bool:
    try:
        # platform is "tpu" both for the native plugin and the axon tunnel
        # (whose *backend* name is "axon")
        d = jax.devices()[0]
        return d.platform == "tpu" or "TPU" in getattr(d, "device_kind", "")
    except Exception:
        return False


def _single_device() -> bool:
    """Pallas kernels don't auto-partition under GSPMD: only dispatch to
    them when execution is single-device (multi-chip meshes take the XLA
    path, which shards fine)."""
    try:
        return jax.device_count() == 1
    except Exception:
        return False


def reference_attention(q, k, v, mask=None, upcast=False):
    """Plain-einsum attention; numerically the oracle for kernel tests.

    Layout: (B, N, H, D).
    """
    orig_dtype = q.dtype
    if upcast:
        q, k, v = q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.astype(orig_dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    upcast: bool = False,
) -> jnp.ndarray:
    """Attention over (B, N, H, D) tensors.

    On TPU with large sequence lengths this dispatches to the Pallas flash
    kernel (ops/flash_attention.py); otherwise XLA's fused attention path.
    """
    seq_q, seq_k = q.shape[1], k.shape[1]
    head_dim = q.shape[-1]
    eligible = mask is None and seq_q == seq_k and _on_tpu() and _single_device()
    forced = (
        (_PALLAS_ENABLED or _FLASH_CTX[0]) and seq_q >= _PALLAS_MIN_SEQ
    )
    auto = head_dim >= _PALLAS_AUTO_MIN_HEAD_DIM and seq_q >= _PALLAS_AUTO_MIN_SEQ
    if eligible and (forced or auto):
        try:
            from .flash_attention import flash_attention

            return flash_attention(q, k, v)
        except Exception:
            pass
    # jax.nn.dot_product_attention expects BTNH, which matches our layout
    if mask is None and not upcast:
        return jax.nn.dot_product_attention(q, k, v)
    return reference_attention(q, k, v, mask=mask, upcast=upcast)
