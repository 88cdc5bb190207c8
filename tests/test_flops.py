"""Analytic FLOP counter (utils/flops.py) against hand-computed counts.

MFU reporting (bench.py) divides these counts by measured device time, so
an error here silently misreports efficiency — pin the primitive math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.utils.flops import count_flops, mfu


def test_matmul():
    a = jnp.zeros((8, 32), jnp.float32)
    b = jnp.zeros((32, 16), jnp.float32)
    assert count_flops(lambda x, y: x @ y, a, b) == 2 * 8 * 16 * 32


def test_batched_dot_general():
    # einsum bhqd,bhkd->bhqk: batch (B,H), M=Q, N=K, contract D
    q = jnp.zeros((2, 4, 64, 40), jnp.bfloat16)
    k = jnp.zeros((2, 4, 128, 40), jnp.bfloat16)
    f = lambda q, k: jnp.einsum("bhqd,bhkd->bhqk", q, k)
    assert count_flops(f, q, k) == 2 * (2 * 4) * 64 * 128 * 40


def test_conv2d():
    # NHWC conv 3x3 same: 2 * out_numel * in_ch * k*k
    x = jnp.zeros((1, 16, 16, 8), jnp.float32)
    w = jnp.zeros((3, 3, 8, 4), jnp.float32)
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    assert count_flops(f, x, w) == 2 * (16 * 16 * 4) * 8 * 9


def test_grouped_conv():
    # feature_group_count=4: in_ch per group = 2
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    w = jnp.zeros((3, 3, 2, 8), jnp.float32)
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4,
    )
    assert count_flops(f, x, w) == 2 * (8 * 8 * 8) * 2 * 9


def test_lhs_dilated_conv_counts_only_real_taps():
    # transposed-upsample form (ops/upsample.py): lhs_dilation=2 inserts a
    # zero between every real input, so only k/d taps per dim do work —
    # 4x4 kernel at dilation 2 => 4 of 16 taps. Counting all 16 inflated
    # decode MFU past 100% in the r4a bench capture.
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    w = jnp.zeros((4, 4, 8, 4), jnp.float32)
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = jax.eval_shape(f, x, w)
    assert out.shape == (1, 16, 16, 4)
    out_numel = 16 * 16 * 4
    assert count_flops(f, x, w) == 2 * out_numel * 8 * (4 * 4 // 4)


def test_scan_multiplies_by_length():
    a = jnp.zeros((8, 8), jnp.float32)

    def f(a):
        def body(c, _):
            return c @ a, None

        out, _ = jax.lax.scan(body, a, None, length=5)
        return out

    assert count_flops(f, a) == 5 * 2 * 8 * 8 * 8


def test_nested_jit_recursed():
    a = jnp.zeros((4, 4), jnp.float32)
    inner = jax.jit(lambda x: x @ x)
    assert count_flops(lambda x: inner(x) + 1.0, a) == 2 * 4 * 4 * 4


def test_cond_takes_max_branch():
    a = jnp.zeros((4, 4), jnp.float32)

    def f(a):
        return jax.lax.cond(
            a[0, 0] > 0, lambda x: x @ x @ x, lambda x: x @ x, a
        )

    # true branch: two matmuls; false: one
    assert count_flops(f, a) == 2 * (2 * 4 * 4 * 4)


def test_elementwise_not_counted():
    a = jnp.zeros((128, 128), jnp.float32)
    assert count_flops(lambda x: jnp.tanh(x) + x * 2, a) == 0


def test_mfu_units():
    # 197 TFLOP in 1s at 197 TFLOP/s peak = 1.0
    assert mfu(int(197e12), 1.0) == pytest.approx(1.0)
    assert mfu(int(197e12), 2.0) == pytest.approx(0.5)


def test_window_static_addresses_compiled_programs():
    """bench.py's MFU section fetches the engine's ALREADY-COMPILED
    programs via facade.window_static(); a key that mismatches what
    animate() compiled would silently trigger fresh multi-minute remote
    compiles on chip. Pin: after one animate(), building the three program
    fns from window_static() adds ZERO new program-cache entries."""
    from test_vid2vid_e2e import base_cfg, tiny_pipeline

    pipe = tiny_pipeline(base_cfg())
    frames = (np.random.RandomState(0).rand(4, 64, 64, 3) * 255).astype(np.uint8)
    pipe.animate(frames, None, overlaps=0, seed=7)

    eng = pipe.engine
    n_before = len(eng._window_cache)
    st = pipe.window_static(overlaps=0, has_input_frames=True)
    sched = eng.build_scheduler(st)
    eng._make_prepare_fn(st, sched)
    eng._make_denoise_fn(st, sched)
    eng._make_decode_fn(st.output_uint8, st.decode_chunk)
    assert len(eng._window_cache) == n_before


def test_unet_window_flops_scale_with_frames():
    """The motion module's frame-frame attention adds an F^2 term; the
    counter must see denoise FLOPs grow superlinearly frame-wise (this is
    the quantity the banded-attention work attacks)."""
    from controlanimate_tpu.config import MotionModuleConfig
    from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig(
        block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"), layers_per_block=1,
        attention_heads=4, cross_attention_dim=24, norm_num_groups=8,
        motion=MotionModuleConfig(
            num_attention_heads=4, temporal_position_encoding_max_len=16
        ),
    )
    model = UNet3DConditionModel(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    def make(F):
        x = jnp.zeros((1, F, 8, 8, 4), jnp.float32)
        ctx = jnp.zeros((1, 7, 24), jnp.float32)
        params = jax.eval_shape(
            lambda k: model.init(k, x, jnp.asarray([1]), ctx)["params"], key
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), params
        )
        return count_flops(
            lambda p: model.apply({"params": p}, x, jnp.asarray([1]), ctx), params
        )

    f8, f16 = make(8), make(16)
    assert f16 > 2 * f8  # superlinear: the F^2 temporal-attention term


def test_padded_matmul():
    from controlanimate_tpu.utils.flops import count_flops_padded

    # (8, 40) @ (40, 64): K 40->128, N 64->128, M 8 already tile-aligned
    a = jnp.zeros((8, 40), jnp.float32)
    b = jnp.zeros((40, 64), jnp.float32)
    f = lambda x, y: x @ y
    assert count_flops_padded(f, a, b) == 2 * 8 * 128 * 128
    assert count_flops_padded(f, a, b) >= count_flops(f, a, b)


def test_padded_attention_ratio():
    """D=40 attention pays 128/40 = 3.2x on the contraction of QK^T."""
    from controlanimate_tpu.utils.flops import count_flops_padded

    q = jnp.zeros((2, 8, 4096, 40), jnp.bfloat16)
    k = jnp.zeros((2, 8, 4096, 40), jnp.bfloat16)
    f = lambda q, k: jnp.einsum("bhqd,bhkd->bhqk", q, k)
    useful = count_flops(f, q, k)
    padded = count_flops_padded(f, q, k)
    assert padded == useful * 128 // 40


def test_padded_conv_small_channels():
    """64-channel 3x3 conv: K = 9*64 = 576 -> 640, N = 64 -> 128."""
    from controlanimate_tpu.utils.flops import count_flops_padded

    x = jnp.zeros((1, 16, 16, 64), jnp.float32)
    w = jnp.zeros((3, 3, 64, 64), jnp.float32)
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert count_flops_padded(f, x, w) == 2 * 16 * 16 * 128 * 640
