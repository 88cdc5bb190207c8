"""Token merging for spatial attention (ToMe-SD, arXiv:2303.17604).

An opt-in approximation knob (RunConfig.token_merge_ratio, like
`encoder_reuse_every` / `temporal_band`): before each spatial transformer
block's self-attention, similar tokens merge so attention runs over fewer
tokens; the output un-merges back to the full grid for the residual add.
The reference has no counterpart — this is beyond-reference acceleration
for the denoise program, whose level-0 spatial attentions are measured AT
their per-kernel floor (perf/denacct_r5.json: 455 ms of the 1108 ms F=24
denoise; perf/flashsweep_r4.json: no kernel beats XLA at D=40) — only
reducing token count moves them.

TPU-first design (vs the CUDA tomesd implementation):
- The dst partition is STATIC: one dst token per ``sx x sy`` box at a fixed
  offset, precomputed as numpy constants at trace time. tomesd randomizes
  the offset per call via a torch generator; a fixed offset keeps the
  program scan-safe and deterministic (no RNG plumbed through the UNet) at
  a small quality cost the ToMe paper measures as minor.
- Merge is one f32 scatter-add + count (segment mean) and unmerge is ONE
  batched gather through a precomputed inverse map — no per-token loops,
  all shapes static, gather indices are runtime values (allowed under jit).
- Similarity runs on the raw block input (tomesd's metric) with f32
  accumulation so bf16 runs rank pairs stably.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable, Tuple

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _partition(h: int, w: int, sx: int, sy: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static dst/src split of the h*w token grid: dst = the top-left token
    of every (sy, sx) box, src = the rest. Returns (dst_pos, src_pos) as
    sorted flat-index arrays; every position appears in exactly one."""
    ys = np.arange(0, h, sy)
    xs = np.arange(0, w, sx)
    dst = (ys[:, None] * w + xs[None, :]).reshape(-1)
    mask = np.zeros(h * w, dtype=bool)
    mask[dst] = True
    src = np.nonzero(~mask)[0]
    return dst.astype(np.int32), src.astype(np.int32)


def merge_ratio_r(n: int, n_src: int, ratio: float, round_to: int = 1) -> int:
    """Number of src tokens to merge: ratio is a fraction of ALL tokens
    (tomesd convention), capped by the src-partition size.

    round_to > 1 snaps the MERGED sequence length (n - r) down to a
    multiple, merging slightly more: TPU kernels want lane/tile-aligned
    sequence lengths (the flash kernel requires the last block dims
    divisible by 8/128; an unaligned N' also pads on the MXU). No-op when
    the kept count is already smaller than one tile (tiny test grids)."""
    r = max(0, min(int(n * float(ratio)), n_src))
    if round_to > 1 and n - r >= round_to:
        n_keep_all = ((n - r) // round_to) * round_to
        r = min(n - n_keep_all, n_src)
    return r


def build_merge(
    metric: jnp.ndarray,  # (B, N, C) raw block input (the ToMe metric)
    h: int,
    w: int,
    ratio: float,
    sx: int = 2,
    sy: int = 2,
    round_to: int = 128,
) -> Tuple[Callable, Callable, int]:
    """Build (merge, unmerge, n_merged) for one block invocation.

    merge(x):   (B, N, C) -> (B, n_merged, C)   [kept src tokens | dst means]
    unmerge(y): (B, n_merged, C) -> (B, N, C)   merged src positions read
                their dst token's output (tomesd's unmerge semantics).
    """
    B, N, _ = metric.shape
    assert N == h * w, f"token count {N} != grid {h}x{w}"
    dst_pos_np, src_pos_np = _partition(h, w, sx, sy)
    n_dst, n_src = len(dst_pos_np), len(src_pos_np)
    r = merge_ratio_r(N, n_src, ratio, round_to=round_to)
    n_keep = n_src - r
    n_merged = n_keep + n_dst
    if r == 0:
        return (lambda x: x), (lambda y: y), N

    dst_pos = jnp.asarray(dst_pos_np)
    src_pos = jnp.asarray(src_pos_np)

    # cosine similarity src->dst on the normalized metric, f32 accumulation
    m = metric.astype(jnp.float32)
    m = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-6)
    sim = jnp.einsum(
        "bsc,bdc->bsd", m[:, src_pos], m[:, dst_pos],
        preferred_element_type=jnp.float32,
    )  # (B, n_src, n_dst)
    best_sim = jnp.max(sim, axis=-1)
    best_dst = jnp.argmax(sim, axis=-1).astype(jnp.int32)  # (B, n_src)

    # most-similar r src tokens merge; order of the kept rest is by rank,
    # matching tomesd (attention is permutation-equivariant, so only the
    # unmerge map needs to know)
    order = jnp.argsort(-best_sim, axis=-1).astype(jnp.int32)  # (B, n_src)
    merged_order = order[:, :r]
    kept_order = order[:, r:]
    kept_src = jnp.take(src_pos, kept_order)      # (B, n_keep) original pos
    merged_src = jnp.take(src_pos, merged_order)  # (B, r) original pos
    merged_dst = jnp.take_along_axis(best_dst, merged_order, axis=1)  # (B, r)

    b_idx = jnp.arange(B)[:, None]

    def merge(x: jnp.ndarray) -> jnp.ndarray:
        kept_vals = jnp.take_along_axis(x, kept_src[..., None], axis=1)
        merged_vals = jnp.take_along_axis(x, merged_src[..., None], axis=1)
        dst_vals = x[:, dst_pos].astype(jnp.float32)
        agg = jnp.zeros_like(dst_vals).at[b_idx, merged_dst].add(
            merged_vals.astype(jnp.float32), mode="drop"
        )
        cnt = jnp.zeros((B, n_dst), jnp.float32).at[b_idx, merged_dst].add(
            1.0, mode="drop"
        )
        dst_mean = ((dst_vals + agg) / (1.0 + cnt)[..., None]).astype(x.dtype)
        return jnp.concatenate([kept_vals, dst_mean], axis=1)

    # inverse map: original position -> row of the merged sequence; built
    # once, unmerge is a single batched gather
    inv = jnp.zeros((B, N), jnp.int32)
    inv = inv.at[b_idx, kept_src].set(
        jnp.broadcast_to(jnp.arange(n_keep, dtype=jnp.int32), (B, n_keep)),
        mode="drop", unique_indices=True,
    )
    inv = inv.at[:, dst_pos].set(
        (n_keep + jnp.arange(n_dst, dtype=jnp.int32))[None, :]
    )
    inv = inv.at[b_idx, merged_src].set(
        n_keep + merged_dst, mode="drop", unique_indices=True
    )

    def unmerge(y: jnp.ndarray) -> jnp.ndarray:
        return jnp.take_along_axis(y, inv[..., None], axis=1)

    return merge, unmerge, n_merged
