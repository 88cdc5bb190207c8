"""Banded temporal attention (the F²-wall attack, VERDICT r3 #3).

The band is an opt-in approximation with a hard exactness contract:
band >= F-1 must be bit-comparable to dense attention (same math, different
summation order — fp tolerance), and any band must equal a numpy oracle
that masks the dense logits to |Δframe| <= band. The reference's temporal
attention is always dense (animatediff/models/motion_module.py:248-329);
band=0 keeps that parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.models.motion_module import (
    MotionModule,
    TemporalEinsumAttention,
    _banded_frame_attention,
)


def _oracle_banded(q, k, v, band):
    """Dense numpy attention with a |Δframe| <= band mask."""
    q, k, v = (np.asarray(t, np.float64) for t in (q, k, v))
    B, F, N, H, D = q.shape
    logits = np.einsum("bfnhd,bgnhd->bnhfg", q, k) / np.sqrt(D)
    f_idx = np.arange(F)
    mask = np.abs(f_idx[:, None] - f_idx[None, :]) <= band
    logits = np.where(mask[None, None, None], logits, -np.inf)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bnhfg,bgnhd->bfnhd", p, v)


@pytest.mark.parametrize("band", [1, 2, 4])
def test_banded_matches_masked_dense_oracle(band):
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(kk, (2, 6, 5, 2, 4), jnp.float32)
        for kk in jax.random.split(key, 3)
    )
    out = _banded_frame_attention(q, k, v, band)
    np.testing.assert_allclose(
        np.asarray(out), _oracle_banded(q, k, v, band), rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("form", ["mulreduce", "einsum"])
def test_wide_band_is_exactly_dense_attention(form, monkeypatch):
    """band >= F-1 covers every frame pair: the attention module must agree
    with its own dense path (both dispatch forms) to fp tolerance."""
    monkeypatch.setenv("CONTROLANIMATE_MOTION_FORM", form)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 6, 4, 8), jnp.float32)
    dense = TemporalEinsumAttention(heads=2, band=0)
    p = dense.init(key, x)
    ref = dense.apply(p, x)
    for band in (5, 7, 100):
        banded = TemporalEinsumAttention(heads=2, band=band)
        out = banded.apply(p, x)  # identical param tree
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_band_changes_result_when_narrow():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 8, 4, 8), jnp.float32)
    dense = TemporalEinsumAttention(heads=2, band=0)
    p = dense.init(key, x)
    out_d = dense.apply(p, x)
    out_b = TemporalEinsumAttention(heads=2, band=1).apply(p, x)
    assert not np.allclose(np.asarray(out_d), np.asarray(out_b), atol=1e-3)


def test_motion_module_band_param_tree_unchanged():
    """The band only re-routes compute; checkpoints load identically."""
    key = jax.random.PRNGKey(3)
    x = jnp.zeros((1, 4, 4, 4, 16))
    p0 = MotionModule(heads=4, max_len=8, groups=4).init(key, x)
    p1 = MotionModule(heads=4, max_len=8, groups=4, band=1).init(key, x)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    # wide band through the whole module == dense module
    out_d = MotionModule(heads=4, max_len=8, groups=4).apply(p0, x)
    out_w = MotionModule(heads=4, max_len=8, groups=4, band=7).apply(p0, x)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_w), atol=2e-5)


def test_runconfig_band_plumbing():
    """RunConfig.temporal_band rewrites the facade's arch (disk builds bake
    it into the UNet); pre-built models with a different band must raise
    instead of silently no-opping the knob. attention_band also parses from
    the inference yaml's motion_module_kwargs."""
    from controlanimate_tpu.config import ArchConfig
    from controlanimate_tpu.models.unet3d import UNet3DConfig

    assert UNet3DConfig.from_arch(ArchConfig()).motion.attention_band == 0

    from test_vid2vid_e2e import base_cfg, tiny_pipeline

    with pytest.raises(ValueError, match="temporal_band"):
        tiny_pipeline(base_cfg(temporal_band=3))


def test_arch_yaml_attention_band(tmp_path):
    from controlanimate_tpu.config import ArchConfig

    y = tmp_path / "inf.yaml"
    y.write_text(
        "unet_additional_kwargs:\n"
        "  motion_module_kwargs:\n"
        "    num_attention_heads: 8\n"
        "    attention_band: 4\n"
    )
    assert ArchConfig.from_yaml(y).motion_module.attention_band == 4


def test_banded_flop_count_below_dense():
    """The whole point: banded removes the F² term. Compare matmul+conv
    FLOPs of a motion module at F=16, band=2 vs dense (einsum form so the
    attention shows up as dot_general)."""
    import os

    from controlanimate_tpu.utils.flops import count_flops

    os.environ["CONTROLANIMATE_MOTION_FORM"] = "einsum"
    try:
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((1, 16, 4, 4, 32))

        def flops(band):
            m = MotionModule(heads=4, max_len=16, groups=4, band=band)
            p = m.init(key, x)
            return count_flops(lambda pp: m.apply(pp, x), p)

        dense, banded = flops(0), flops(2)
        # banded attention runs on the VPU (no dot_general for logits), so
        # the counted MXU work must strictly drop
        assert banded < dense
    finally:
        del os.environ["CONTROLANIMATE_MOTION_FORM"]
