"""FVD: Fréchet distance math, I3D architecture/ingest, and the gated
fallback feature space (VERDICT r3 #5; BASELINE.md's quality metric).

The Kinetics I3D checkpoint is absent in this environment, so the
checkpoint path is exercised with a SYNTHETIC pytorch-i3d state dict at
the real geometry (mapping coverage + shape contract via eval_shape; no
forward), and the metric behavior is pinned on the fixed-seed random-init
fallback at reduced width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.models.i3d import I3D, _MIXED, i3d_params_from_torch
from scripts.eval_quality import frechet_distance, fvd


def test_frechet_identical_sets_is_zero():
    rng = np.random.RandomState(0)
    a = rng.randn(32, 8)
    assert frechet_distance(a, a.copy()) == pytest.approx(0.0, abs=1e-8)


def test_frechet_analytic_diagonal_case():
    # two-point sets: mean 0, sample cov diag([2s^2, 0]) (ddof=1), which
    # commutes -> FD = (sqrt(2)s - sqrt(2)t)^2 = 2 (s - t)^2
    def pair(s):
        return np.array([[s, 0.0], [-s, 0.0]])

    s, t = 3.0, 1.0
    assert frechet_distance(pair(s), pair(t)) == pytest.approx(
        2 * (s - t) ** 2, rel=1e-9
    )


def test_frechet_mean_shift_only():
    rng = np.random.RandomState(1)
    a = rng.randn(64, 4)
    b = a + np.array([2.0, 0, 0, 0])
    # same covariance: FD reduces to |delta mu|^2
    assert frechet_distance(a, b) == pytest.approx(4.0, rel=1e-6)


def _synthetic_i3d_state_dict():
    """pytorch-i3d layout at the real Kinetics geometry (random values)."""
    rng = np.random.RandomState(0)
    sd = {}

    def unit(prefix, cin, cout, k):
        sd[f"{prefix}.conv3d.weight"] = rng.randn(cout, cin, k, k, k).astype(np.float32) * 0.02
        for stat, val in (("weight", 1.0), ("bias", 0.0), ("running_mean", 0.0),
                          ("running_var", 1.0)):
            sd[f"{prefix}.bn.{stat}"] = np.full(cout, val, np.float32) + (
                rng.randn(cout).astype(np.float32) * 0.01
            )
        sd[f"{prefix}.bn.num_batches_tracked"] = np.asarray(100, np.int64)

    unit("Conv3d_1a_7x7", 3, 64, 7)
    unit("Conv3d_2b_1x1", 64, 64, 1)
    unit("Conv3d_2c_3x3", 64, 192, 3)
    cin = 192
    for name, (b0, b1a, b1b, b2a, b2b, b3b) in _MIXED.items():
        unit(f"{name}.b0", cin, b0, 1)
        unit(f"{name}.b1a", cin, b1a, 1)
        unit(f"{name}.b1b", b1a, b1b, 3)
        unit(f"{name}.b2a", cin, b2a, 1)
        unit(f"{name}.b2b", b2a, b2b, 3)
        unit(f"{name}.b3b", cin, b3b, 1)
        cin = b0 + b1b + b2b + b3b
    # classifier head the ingest must ignore
    sd["logits.conv3d.weight"] = rng.randn(400, 1024, 1, 1, 1).astype(np.float32)
    sd["logits.conv3d.bias"] = np.zeros(400, np.float32)
    return sd


def test_i3d_ingest_covers_checkpoint_and_matches_module_tree():
    """Every non-logits key consumed; folded params drive the width-1
    module to the documented (B, 1024) feature shape (eval_shape only —
    no full-size forward on CPU)."""
    params = i3d_params_from_torch(_synthetic_i3d_state_dict())
    model = I3D()
    out = jax.eval_shape(
        lambda p, x: model.apply({"params": p}, x),
        params, jnp.zeros((2, 16, 224, 224, 3), jnp.float32),
    )
    assert out.shape == (2, 1024) and out.dtype == jnp.float32
    # param tree must match the module's own init tree exactly
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 32, 3)))["params"]
    )
    flat_got = {"/".join(map(str, k)): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_want = {"/".join(map(str, k)): v.shape for k, v in
                 jax.tree_util.tree_flatten_with_path(init)[0]}
    assert flat_got.keys() == flat_want.keys()
    mismatched = {k: (flat_got[k], flat_want[k])
                  for k in flat_want if tuple(flat_got[k]) != tuple(flat_want[k])}
    assert not mismatched, mismatched


def test_i3d_ingest_rejects_unknown_layout():
    sd = _synthetic_i3d_state_dict()
    sd["Mixed_9z.b0.conv3d.weight"] = np.zeros((1, 1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="unrecognized I3D checkpoint keys"):
        i3d_params_from_torch(sd)


def test_i3d_bn_folding_matches_explicit_bn():
    """Folded conv == conv -> batchnorm(running stats) on real numbers."""
    from controlanimate_tpu.models.i3d import _fold_bn

    rng = np.random.RandomState(3)
    cin, cout = 4, 6
    sd = {
        "u.conv3d.weight": rng.randn(cout, cin, 3, 3, 3).astype(np.float32),
        "u.bn.weight": rng.rand(cout).astype(np.float32) + 0.5,
        "u.bn.bias": rng.randn(cout).astype(np.float32),
        "u.bn.running_mean": rng.randn(cout).astype(np.float32),
        "u.bn.running_var": rng.rand(cout).astype(np.float32) + 0.1,
    }
    folded = _fold_bn(sd, "u")
    x = jnp.asarray(rng.randn(1, 5, 8, 8, cin), jnp.float32)
    from flax import linen as nn

    conv = nn.Conv(cout, (3, 3, 3), padding="SAME", name="conv3d")
    raw = conv.apply(
        {"params": {"kernel": np.transpose(sd["u.conv3d.weight"], (2, 3, 4, 1, 0)),
                    "bias": np.zeros(cout, np.float32)}}, x)
    inv = sd["u.bn.weight"] / np.sqrt(sd["u.bn.running_var"] + 1e-3)
    want = (np.asarray(raw) - sd["u.bn.running_mean"]) * inv + sd["u.bn.bias"]
    got = conv.apply({"params": folded["conv3d"]}, x)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_videos():
    rng = np.random.RandomState(0)
    base = (rng.rand(16, 32, 32, 3) * 255).astype(np.uint8)

    def perturb(strength):
        noisy = base.astype(np.float64) + rng.randn(*base.shape) * strength
        return [f for f in np.clip(noisy, 0, 255).astype(np.uint8)]

    return list(base), perturb


def test_fvd_fallback_identical_is_zero_and_monotone(tiny_videos):
    base, perturb = tiny_videos
    kw = dict(clip_len=8, _width=0.0625)
    same = fvd(base, [f.copy() for f in base], **kw)
    assert "random_init" in same["fvd_feature_space"]
    assert same["fvd_clips"] == [2, 2]
    assert same["fvd"] == pytest.approx(0.0, abs=1e-4)
    weak = fvd(base, perturb(8.0), **kw)
    strong = fvd(base, perturb(64.0), **kw)
    assert 0 < weak["fvd"] < strong["fvd"]


def test_frechet_single_observation_sets():
    # one clip per set (short videos): degenerate Gaussians -> pure
    # mean-shift distance, no LinAlgError from np.cov's 0-d output
    a = np.array([[1.0, 2.0, 3.0]])
    b = np.array([[1.0, 2.0, 5.0]])
    assert frechet_distance(a, b) == pytest.approx(4.0)
    assert frechet_distance(a, a.copy()) == pytest.approx(0.0)


def test_fvd_missing_checkpoint_raises(tiny_videos):
    base, _ = tiny_videos
    with pytest.raises(FileNotFoundError):
        fvd(base, base, i3d_path="/nonexistent/rgb_imagenet.pt")
