"""Pallas flash attention for TPU — the UNet's hot spatial attention.

Replaces the reference's xformers memory-efficient attention
(reference: modules/controlanimate_pipeline.py:111-116) with a TPU kernel:
full-K/V-resident tiling over the query axis, fp32 softmax, bf16 matmul IO.

Shape regime (SD1.5 at 512px, 16-frame window): B' = B*F up to ~32 windows,
N_q = N_kv = H*W in {4096, 1024, 256, 64}, d_head in {40, 80, 160} (padded
to the 128-lane tile by the wrapper). Cross-attention has N_kv = 77/81 and is
left to XLA (tiny K/V — fusion is already optimal).

Why not XLA here: at (B=16, N=4096, H=8, D=40) XLA's attention materializes
the (B, H, N, N) logits in HBM — 4.3 GB of f32 traffic per call (~12 ms at
v5e HBM bandwidth). At D_head=40 the K/V for one (batch, head) is only
4096x128(padded)x2B = 1 MB, so the whole K/V fits in VMEM and the kernel
streams only Q and O through HBM (~170 MB). The remaining cost is the MXU
time on the 40->128 lane padding, ~6 ms — about half of XLA.

Why not the stock jax.experimental flash kernel: it is tuned for LLM head
dims (128/256); at D=40 it measured 68-130 ms on these shapes (r2 ledger).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Tunable block sizes (swept on the real chip via scripts/tpu_perf.py attn).
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 4096  # >= N_kv means one-pass softmax (no online rescale)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, kv_len: int):
    """One (batch*head, q-block) grid cell. K/V for the whole sequence are
    VMEM-resident (their block index does not vary with the q-block grid
    dim, so Pallas fetches them once per batch*head row).

    Matmul INPUTS stay in the IO dtype (bf16): the MXU's f32 rate is ~8x
    lower — accumulation is f32 via preferred_element_type."""
    q = q_ref[0]  # (BQ, D), bf16
    bq, d = q.shape
    num_k_blocks = kv_len // block_k

    if num_k_blocks == 1:
        # one-pass softmax: logits for the full KV row fit in VMEM, so no
        # online max/sum rescaling (fewer VPU passes, one big MXU op each way)
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, KV) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (acc / l).astype(o_ref.dtype)
        return

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]  # (BK, D), bf16
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK) f32 (scale applied post-dot in f32)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m - m_new)
        l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * correction + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_k_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(n: int, target: int) -> int:
    b = min(n, target)
    while n % b:
        b //= 2
    return max(b, 1)


def flash_attention(
    q,
    k,
    v,
    scale: float | None = None,
    interpret: bool = False,
    block_q: int | None = None,
    block_k: int | None = None,
):
    """q, k, v: (B, N, H, D) -> (B, N, H, D). Self-attention (no mask)."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    # pad head dim to the 128-lane tile
    D_pad = ((D + 127) // 128) * 128
    if D_pad != D:
        pad = [(0, 0), (0, 0), (0, 0), (0, D_pad - D)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    # fold heads into batch: (B*H, N, D)
    qb = q.transpose(0, 2, 1, 3).reshape(B * H, Nq, D_pad)
    kb = k.transpose(0, 2, 1, 3).reshape(B * H, Nk, D_pad)
    vb = v.transpose(0, 2, 1, 3).reshape(B * H, Nk, D_pad)

    bq = _pick_block(Nq, block_q or DEFAULT_BLOCK_Q)
    bk = _pick_block(Nk, block_k or DEFAULT_BLOCK_K)

    kernel = functools.partial(_attn_kernel, scale=scale, block_k=bk, kv_len=Nk)
    out = pl.pallas_call(
        kernel,
        grid=(B * H, Nq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D_pad), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, D_pad), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, D_pad), qb.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D_pad,
            bytes_accessed=(B * H) * (Nq + 2 * Nk + Nq) * D_pad * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=interpret,
    )(qb, kb, vb)

    out = out.reshape(B, H, Nq, D_pad).transpose(0, 2, 1, 3)
    if D_pad != D:
        out = out[..., :D]
    return out
