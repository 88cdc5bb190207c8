"""Fused motion-module Pallas kernel vs the unfused module path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlanimate_tpu.models import motion_module as mm
from controlanimate_tpu.models.motion_module import MotionModule
from controlanimate_tpu.ops import motion_kernel as mk


def _nontrivial_params(params, key):
    """Randomize every param (incl. the zero-init proj_out) so the fused
    path is exercised with non-identity numerics."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        0.05 * jax.random.normal(k, l.shape, l.dtype) + l for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("use_pe", [True, False])
def test_fused_matches_unfused(monkeypatch, use_pe):
    B, F, H, W, C = 1, 4, 4, 8, 64  # N=32, heads 8 x D=8
    module = MotionModule(heads=8, max_len=8, use_pos_encoding=use_pe, groups=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, F, H, W, C), jnp.float32) * 0.5
    params = _nontrivial_params(module.init(key, x)["params"], key)

    ref = module.apply({"params": params}, x)  # XLA path (CPU: _on_tpu False)

    # force the fused dispatch, with the kernel in interpreter mode
    monkeypatch.setattr(mm, "_on_tpu", lambda: True)
    monkeypatch.setattr(mm, "_single_device", lambda: True)
    monkeypatch.setattr(mm, "motion_kernel_enabled", lambda: True)
    fused_calls = []

    def fused_interpret(*a, **kw):
        fused_calls.append(1)
        return mk.motion_module_fused(*a, **dict(kw, interpret=True))

    monkeypatch.setattr(mm, "motion_module_fused", fused_interpret)
    out = module.apply({"params": params}, x)
    assert fused_calls, "fused path was not exercised"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_param_tree_unchanged():
    """The refactor must keep the exact checkpoint-facing tree."""
    module = MotionModule(heads=4, max_len=8, groups=8)
    x = jnp.zeros((1, 2, 4, 4, 32), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x)["params"]

    def paths(tree, prefix=""):
        out = []
        for k, v in tree.items():
            if isinstance(v, dict):
                out += paths(v, prefix + k + "/")
            else:
                out.append(prefix + k)
        return sorted(out)

    expected = sorted(
        ["norm/scale", "norm/bias", "proj_in/kernel", "proj_in/bias",
         "proj_out/kernel", "proj_out/bias"]
        + [
            f"transformer_blocks_0/attention_blocks_{i}/{leaf}"
            for i in (0, 1)
            for leaf in (
                "norm/scale", "norm/bias",
                "attention/to_q/kernel", "attention/to_k/kernel",
                "attention/to_v/kernel",
                "attention/to_out_0/kernel", "attention/to_out_0/bias",
            )
        ]
        + ["transformer_blocks_0/norm/scale", "transformer_blocks_0/norm/bias",
           "transformer_blocks_0/ff/net_0/proj/kernel",
           "transformer_blocks_0/ff/net_0/proj/bias",
           "transformer_blocks_0/ff/net_2/kernel",
           "transformer_blocks_0/ff/net_2/bias"]
    )
    assert paths(params) == expected


def test_identity_at_init():
    """proj_out is zero-initialized: a fresh module must be an exact
    identity residual (what makes non-strict 2D weight loading sound)."""
    module = MotionModule(heads=4, max_len=8, groups=8)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 2, 4, 4, 32), jnp.float32)
    params = module.init(key, x)["params"]
    out = module.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
