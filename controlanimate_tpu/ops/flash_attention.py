"""Pallas flash attention for TPU — the UNet's hot spatial attention.

Replaces the reference's xformers memory-efficient attention
(reference: modules/controlanimate_pipeline.py:111-116) with a TPU kernel:
online-softmax tiling over the KV axis, fp32 accumulation, bf16 IO.

Shape regime (SD1.5 at 512px, 16-frame window): B' = B*F*heads up to ~256,
N_q = N_kv = H*W in {4096, 1024, 256, 64}, d_head in {40, 80, 160} (padded
to the 128-lane tile by the caller). Cross-attention has N_kv = 77/81 and is
left to XLA (tiny K/V — fusion is already optimal).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, kv_len: int):
    # keep the matmul INPUTS in the IO dtype (bf16): the MXU's f32 rate is
    # ~8x lower than bf16 — accumulation stays f32 via preferred_element_type
    q = q_ref[0]  # (BQ, D), bf16
    bq, d = q.shape
    num_k_blocks = kv_len // block_k

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


def flash_attention(q, k, v, scale: float | None = None, interpret: bool = False):
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

    bq = _pick_block(Nq, 256)
    bk = _pick_block(Nk, 512)

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
