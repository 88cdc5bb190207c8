"""ToMe-SD token merging (ops/token_merge.py + transformer wiring).

Oracle: an independent numpy implementation of the published algorithm
(arXiv:2303.17604 — bipartite soft matching with a strided dst partition,
mean merge, dst-readback unmerge) checked against the TPU-shaped
scatter/gather implementation. The knob is an opt-in approximation like
encoder_reuse_every; ratio 0 must leave programs byte-identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.ops.token_merge import (
    _partition,
    build_merge,
    merge_ratio_r,
)


def oracle(x, h, w, ratio, sx=2, sy=2):
    """Independent numpy re-derivation: returns (merged, unmerged)."""
    B, N, C = x.shape
    ys, xs = np.arange(0, h, sy), np.arange(0, w, sx)
    dst = (ys[:, None] * w + xs[None, :]).reshape(-1)
    mask = np.zeros(N, bool)
    mask[dst] = True
    src = np.nonzero(~mask)[0]
    r = min(int(N * ratio), len(src))
    m = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-6)
    merged_out = np.zeros((B, len(src) - r + len(dst), C), x.dtype)
    unmerged_out = np.zeros_like(x)
    for b in range(B):
        sim = m[b, src] @ m[b, dst].T
        best, bidx = sim.max(-1), sim.argmax(-1)
        order = np.argsort(-best, kind="stable")
        mo, ko = order[:r], order[r:]
        kept_pos, merged_pos = src[ko], src[mo]
        dst_vals = x[b, dst].astype(np.float64)
        cnt = np.ones(len(dst))
        for i, o in enumerate(mo):
            dst_vals[bidx[o]] += x[b, src[o]]
            cnt[bidx[o]] += 1
        dst_mean = (dst_vals / cnt[:, None]).astype(x.dtype)
        merged_out[b] = np.concatenate([x[b, kept_pos], dst_mean], 0)
        unmerged_out[b, kept_pos] = x[b, kept_pos]
        unmerged_out[b, dst] = dst_mean
        unmerged_out[b, merged_pos] = dst_mean[bidx[mo]]
    return merged_out, unmerged_out


@pytest.mark.parametrize("ratio", [0.25, 0.5, 0.75])
def test_matches_numpy_oracle(ratio):
    rng = np.random.RandomState(7)
    B, h, w, C = 2, 8, 8, 12
    x = rng.randn(B, h * w, C).astype(np.float32)
    xj = jnp.asarray(x)
    merge, unmerge, n_merged = build_merge(xj, h, w, ratio)
    got_m = np.asarray(merge(xj))
    got_u = np.asarray(unmerge(merge(xj)))
    want_m, want_u = oracle(x, h, w, ratio)
    assert got_m.shape == want_m.shape == (B, n_merged, C)
    np.testing.assert_allclose(got_m, want_m, atol=1e-5)
    np.testing.assert_allclose(got_u, want_u, atol=1e-5)


def test_ratio_zero_is_identity():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 8), jnp.float32)
    merge, unmerge, n = build_merge(x, 8, 8, 0.0)
    assert n == 64 and merge(x) is x and unmerge(x) is x


def test_constant_tokens_reconstruct_exactly():
    x = jnp.full((2, 64, 8), 3.25, jnp.float32)
    merge, unmerge, _ = build_merge(x, 8, 8, 0.5)
    np.testing.assert_array_equal(np.asarray(unmerge(merge(x))), np.asarray(x))


def test_partition_covers_grid_once():
    dst, src = _partition(6, 10, 2, 2)
    all_pos = np.sort(np.concatenate([dst, src]))
    np.testing.assert_array_equal(all_pos, np.arange(60))
    assert len(dst) == 3 * 5
    assert merge_ratio_r(60, len(src), 0.9) == len(src)  # capped at src count
    # tile alignment: merged length snaps DOWN to a multiple of round_to
    # (flash kernel block divisibility; MXU lane pad)
    assert merge_ratio_r(4096, 3072, 0.3, round_to=128) == 1280  # keep 2816
    assert merge_ratio_r(4096, 3072, 0.5, round_to=128) == 2048  # already aligned
    assert merge_ratio_r(64, 48, 0.5, round_to=128) == 32  # tiny grid: no snap


def test_jit_and_scan_safe():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 8), jnp.float32)

    @jax.jit
    def step(x):
        def body(carry, _):
            merge, unmerge, _ = build_merge(carry, 8, 8, 0.5)
            return unmerge(merge(carry)), ()

        out, _ = jax.lax.scan(body, x, jnp.arange(3))
        return out

    assert np.isfinite(np.asarray(step(x))).all()


# ---- transformer wiring ---------------------------------------------------

def _block_params_and_out(tome_ratio, x, ctx, min_tokens=16):
    from controlanimate_tpu.models.transformer import BasicTransformerBlock

    blk = BasicTransformerBlock(
        heads=2, dim_head=4, cross_attention_dim=8,
        tome_ratio=tome_ratio, tome_min_tokens=min_tokens,
    )
    params = blk.init(jax.random.PRNGKey(0), x, ctx, hw=(8, 8))
    return params, blk.apply(params, x, ctx, hw=(8, 8))


def test_block_param_structure_unchanged_by_tome():
    """Weight loading must not see a different module tree with the knob on."""
    x = jnp.asarray(np.random.RandomState(2).randn(2, 64, 8), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(3).randn(2, 7, 8), jnp.float32)
    p0, out0 = _block_params_and_out(0.0, x, ctx)
    p1, out1 = _block_params_and_out(0.5, x, ctx)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert out0.shape == out1.shape
    assert not np.allclose(np.asarray(out0), np.asarray(out1))  # approx ON differs


def test_block_below_min_tokens_is_exact():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 64, 8), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(3).randn(2, 7, 8), jnp.float32)
    _, out0 = _block_params_and_out(0.0, x, ctx)
    _, out1 = _block_params_and_out(0.5, x, ctx, min_tokens=4096)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))


def test_unet_forward_with_tome(tiny_unet_factory=None):
    from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig

    cfg = UNet3DConfig(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1,
        attention_heads=2, cross_attention_dim=8, norm_num_groups=4,
        token_merge_ratio=0.5, token_merge_min_tokens=16,
    )
    unet = UNet3DConditionModel(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 32, 32, 4), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 7, 8), jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), x, jnp.asarray([1]), ctx)
    out = unet.apply(params, x, jnp.asarray([1]), ctx)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()

    # ratio=0 config must produce the byte-identical exact path
    cfg0 = UNet3DConfig(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1,
        attention_heads=2, cross_attention_dim=8, norm_num_groups=4,
    )
    unet0 = UNet3DConditionModel(cfg0)
    out0 = unet0.apply(params, x, jnp.asarray([1]), ctx)
    assert not np.allclose(np.asarray(out), np.asarray(out0))


def test_motion_module_tome():
    """Motion-module extension: merged token axis around the temporal
    transformer — param tree unchanged, ratio=0 exact, ratio>0 runs."""
    from controlanimate_tpu.models.motion_module import MotionModule

    x = jnp.asarray(np.random.RandomState(5).randn(1, 4, 8, 8, 16), jnp.float32)

    def build(ratio):
        m = MotionModule(heads=2, groups=4, max_len=8,
                         tome_ratio=ratio, tome_min_tokens=16)
        p = m.init(jax.random.PRNGKey(0), x)
        return p, m.apply(p, x)

    p0, out0 = build(0.0)
    p1, out1 = build(0.5)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert out1.shape == x.shape and np.isfinite(np.asarray(out1)).all()
    # zero-init proj_out makes a fresh module an identity residual in BOTH
    # paths — outputs equal x exactly
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(x), atol=1e-6)

    # with a non-zero proj_out the merged path must differ from exact
    def bump(p):
        import flax

        t = flax.core.unfreeze(p) if hasattr(flax.core, "unfreeze") else dict(p)
        t["params"]["proj_out"]["kernel"] = (
            jnp.asarray(np.random.RandomState(9).randn(16, 16), jnp.float32) * 0.1
        )
        return t

    m0 = MotionModule(heads=2, groups=4, max_len=8, tome_ratio=0.0, tome_min_tokens=16)
    m1 = MotionModule(heads=2, groups=4, max_len=8, tome_ratio=0.5, tome_min_tokens=16)
    pb = bump(p0)
    o0 = m0.apply(pb, x)
    o1 = m1.apply(pb, x)
    assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_facade_rejects_bad_ratio_and_mismatched_models():
    from controlanimate_tpu.config import RunConfig
    from controlanimate_tpu.pipelines.facade import ControlAnimatePipeline

    with pytest.raises(ValueError, match="token_merge_ratio"):
        ControlAnimatePipeline(RunConfig(token_merge_ratio=1.5))
