"""ControlNet structural tests + mapping coverage + UNet integration."""

import jax
import jax.numpy as jnp
import numpy as np

from controlanimate_tpu.config import MotionModuleConfig
from controlanimate_tpu.models.controlnet import (
    ControlNetModel,
    sum_controlnet_residuals,
)
from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from controlanimate_tpu.weights.controlnet_weights import controlnet_mapping

TINY = UNet3DConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
    up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
    attention_heads=4,
    cross_attention_dim=24,
    norm_num_groups=8,
    use_motion_module=False,
)
TINY3D = UNet3DConfig(
    **{**TINY.__dict__, "use_motion_module": True,
       "motion": MotionModuleConfig(num_attention_heads=4, temporal_position_encoding_max_len=8)}
)


def init_cn():
    model = ControlNetModel(TINY)
    x = jnp.zeros((1, 2, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 24))
    cond = jnp.zeros((1, 2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([1]), ctx, cond)["params"]
    return model, params


def test_residual_shapes_feed_unet():
    """ControlNet residual list must line up 1:1 with UNet down skips
    (reference: unet.py:567-576)."""
    cn, cn_params = init_cn()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 24))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 64, 64, 3))
    downs, mid = cn.apply({"params": cn_params}, x, jnp.asarray([5]), ctx, cond)
    assert len(downs) == 4  # conv_in + 1 layer + downsample + 1 layer (TINY)

    unet = UNet3DConditionModel(TINY3D)
    up = unet.init(jax.random.PRNGKey(0), x, jnp.asarray([1]), ctx)["params"]
    out = unet.apply(
        {"params": up}, x, jnp.asarray([5]), ctx,
        down_block_additional_residuals=downs,
        mid_block_additional_residual=mid,
    )
    assert out.shape == x.shape


def test_zero_init_heads_give_zero_residuals():
    """Fresh ControlNet zero convs => all residuals exactly zero (safe to
    attach to a pretrained UNet, the ControlNet training property)."""
    cn, cn_params = init_cn()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 24))
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 64, 64, 3))
    # zero the head convs as diffusers init does
    for k in list(cn_params):
        if k.startswith("controlnet_down_blocks") or k == "controlnet_mid_block":
            cn_params[k]["conv"]["kernel"] = jnp.zeros_like(cn_params[k]["conv"]["kernel"])
            cn_params[k]["conv"]["bias"] = jnp.zeros_like(cn_params[k]["conv"]["bias"])
    downs, mid = cn.apply({"params": cn_params}, x, jnp.asarray([5]), ctx, cond)
    for d in downs:
        assert float(jnp.max(jnp.abs(d))) == 0.0
    assert float(jnp.max(jnp.abs(mid))) == 0.0


def test_cond_scale_and_multi_net_sum():
    cn, cn_params = init_cn()
    x = jnp.ones((1, 2, 8, 8, 4))
    ctx = jnp.ones((1, 7, 24))
    cond = jnp.ones((1, 2, 64, 64, 3))
    d1, m1 = cn.apply({"params": cn_params}, x, jnp.asarray([5]), ctx, cond,
                      conditioning_scale=1.0)
    d2, m2 = cn.apply({"params": cn_params}, x, jnp.asarray([5]), ctx, cond,
                      conditioning_scale=0.5)
    np.testing.assert_allclose(np.asarray(m1) * 0.5, np.asarray(m2), rtol=1e-5)

    downs, mid = sum_controlnet_residuals([(d1, m1), (d2, m2)])
    np.testing.assert_allclose(np.asarray(mid), np.asarray(m1) * 1.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(downs[0]), np.asarray(d1[0]) * 1.5, rtol=1e-5)


def test_guess_mode_logspace_scaling():
    cn, cn_params = init_cn()
    x = jnp.ones((1, 2, 8, 8, 4))
    ctx = jnp.ones((1, 7, 24))
    cond = jnp.ones((1, 2, 64, 64, 3))
    d, m = cn.apply({"params": cn_params}, x, jnp.asarray([5]), ctx, cond)
    dg, mg = cn.apply({"params": cn_params}, x, jnp.asarray([5]), ctx, cond, guess_mode=True)
    scales = np.logspace(-1, 0, len(d) + 1)
    np.testing.assert_allclose(np.asarray(dg[0]), np.asarray(d[0]) * scales[0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mg), np.asarray(m) * scales[-1], rtol=1e-4)


def test_mapping_covers_every_param():
    _, params = init_cn()

    def leaf_paths(tree, prefix=""):
        out = []
        for k in sorted(tree):
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(tree[k], dict):
                out.extend(leaf_paths(tree[k], p))
            else:
                out.append(p)
        return out

    mapped = {fpath for _, fpath, _ in controlnet_mapping(TINY)}
    leaves = set(leaf_paths(params))
    assert not (leaves - mapped), f"unmapped: {sorted(leaves - mapped)[:8]}"
    assert not (mapped - leaves), f"phantom: {sorted(mapped - leaves)[:8]}"


def test_controlnet_golden_vs_torch_oracle():
    """ControlNet numerics vs an independent torch mirror (the last
    product-path model without a golden oracle): cond embedding, down+mid
    path, zero-conv heads, guess-mode logspace scaling, cond scale."""
    import torch

    from controlanimate_tpu.weights.controlnet_weights import controlnet_params_from_torch
    from torch_mirrors import TorchControlNet, randomize_

    cfg = UNet3DConfig(
        block_out_channels=(8, 16), layers_per_block=1,
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        attention_heads=2, cross_attention_dim=16, norm_num_groups=4,
        use_motion_module=False,
    )
    oracle = TorchControlNet(cfg)
    randomize_(oracle, seed=9)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = controlnet_params_from_torch(sd, cfg)

    model = ControlNetModel(cfg)
    rng = np.random.RandomState(3)
    B, F = 1, 2
    x = rng.randn(B, F, 8, 8, 4).astype(np.float32)
    t = np.asarray([123], np.int64)
    ctx = rng.randn(B, 7, 16).astype(np.float32) * 0.5
    cond = rng.rand(B, F, 64, 64, 3).astype(np.float32)

    for guess, scale in [(False, 1.0), (True, 0.7)]:
        downs_j, mid_j = model.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
            jnp.asarray(cond), conditioning_scale=scale, guess_mode=guess,
        )
        with torch.no_grad():
            downs_t, mid_t = oracle(
                torch.tensor(x).permute(0, 4, 1, 2, 3), torch.tensor(t),
                torch.tensor(ctx), torch.tensor(cond).permute(0, 4, 1, 2, 3),
                conditioning_scale=scale, guess_mode=guess,
            )
        assert len(downs_j) == len(downs_t)
        # random 0.25-scale weights blow activations up to ~1e3 through the
        # unnormalized zero-conv heads: compare relative to the output scale
        for dj, dt_ in zip(downs_j, downs_t):
            ref = dt_.permute(0, 2, 3, 4, 1).numpy()
            tol = 1e-4 * max(float(np.abs(ref).max()), 1.0)
            assert np.abs(np.asarray(dj) - ref).max() < tol
        ref = mid_t.permute(0, 2, 3, 4, 1).numpy()
        tol = 1e-4 * max(float(np.abs(ref).max()), 1.0)
        assert np.abs(np.asarray(mid_j) - ref).max() < tol
