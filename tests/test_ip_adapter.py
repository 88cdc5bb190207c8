"""IP-Adapter projection models + K/V injection tests."""

import jax
import jax.numpy as jnp
import numpy as np

from controlanimate_tpu.config import MotionModuleConfig
from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from controlanimate_tpu.pipelines.ip_adapter import (
    ImageProjModel,
    IPAdapter,
    MLPProjModel,
    Resampler,
)


def test_image_proj_shapes():
    m = ImageProjModel(cross_attention_dim=32, num_tokens=4)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 64)))["params"]
    out = m.apply({"params": p}, jnp.ones((2, 64)))
    assert out.shape == (2, 4, 32)


def test_mlp_proj_shapes():
    m = MLPProjModel(cross_attention_dim=32)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 64)))["params"]
    assert m.apply({"params": p}, jnp.ones((2, 64))).shape == (2, 1, 32)


def test_resampler_shapes():
    m = Resampler(dim=64, depth=2, dim_head=16, heads=4, num_queries=8,
                  embedding_dim=48, output_dim=32)
    x = jnp.ones((2, 10, 48))  # penultimate CLIP states
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": p}, x)
    assert out.shape == (2, 8, 32)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_kv_injection_structural():
    """K/V weights land in every attn2 by structural path, in checkpoint
    order (replaces the reference's regex renumbering,
    modules/ip_adapter.py:163-185)."""
    cfg = UNet3DConfig(
        block_out_channels=(8, 16),
        layers_per_block=1,
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        attention_heads=2,
        cross_attention_dim=16,
        norm_num_groups=4,
        ip_tokens=4,
        motion=MotionModuleConfig(num_attention_heads=2, temporal_position_encoding_max_len=8),
    )
    unet = UNet3DConditionModel(cfg)
    ctx = jnp.zeros((1, 11, 16))  # 7 text + 4 image tokens
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), jnp.asarray([1]), ctx
    )["params"]

    ipa = IPAdapter.random_init(clip_embed_dim=8, cross_attention_dim=16)
    paths = ipa.attn2_paths_in_checkpoint_order(cfg)
    assert paths == [
        "down_blocks_0_attentions_0",
        "up_blocks_1_attentions_0",
        "up_blocks_1_attentions_1",
        "mid_block_attentions_0",
    ]
    # synthetic checkpoint with recognizable values; torch weight layout is
    # (inner_dim, cross_attention_dim) and inner_dim varies per block
    inner_dims = {"down_blocks_0_attentions_0": 8, "up_blocks_1_attentions_0": 8,
                  "up_blocks_1_attentions_1": 8, "mid_block_attentions_0": 16}
    ip_sd = {}
    for i, path in enumerate(paths):
        ck = 2 * i + 1
        d = inner_dims[path]
        ip_sd[f"{ck}.to_k_ip.weight"] = np.full((d, 16), float(i), np.float32)
        ip_sd[f"{ck}.to_v_ip.weight"] = np.full((d, 16), float(i) + 0.5, np.float32)
    ipa.ip_sd = ip_sd
    params = ipa.inject_into_unet_params(params, cfg)
    for i, path in enumerate(paths):
        attn2 = params[path]["transformer_blocks_0"]["attn2"]
        assert float(attn2["to_k_ip"]["kernel"][0, 0]) == float(i)
        assert float(attn2["to_v_ip"]["kernel"][0, 0]) == float(i) + 0.5

    # the model runs with the injected params and ip_scale affects output
    ctx_rand = jax.random.normal(jax.random.PRNGKey(4), (1, 11, 16))
    out0 = unet.apply({"params": params}, jnp.ones((1, 2, 8, 8, 4)),
                      jnp.asarray([5]), ctx_rand, ip_scale=0.0)
    out1 = unet.apply({"params": params}, jnp.ones((1, 2, 8, 8, 4)),
                      jnp.asarray([5]), ctx_rand, ip_scale=1.0)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_ip_scale_zero_matches_text_only():
    """With ip_scale=0 the dual-stream attention must equal text-only
    attention over the truncated context."""
    cfg_ip = UNet3DConfig(
        block_out_channels=(8, 16),
        layers_per_block=1,
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        attention_heads=2, cross_attention_dim=16, norm_num_groups=4,
        ip_tokens=4, use_motion_module=False,
    )
    cfg_plain = UNet3DConfig(**{**cfg_ip.__dict__, "ip_tokens": 0})
    unet_ip = UNet3DConditionModel(cfg_ip)
    unet_plain = UNet3DConditionModel(cfg_plain)

    text = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
    image_tokens = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16))
    ctx_full = jnp.concatenate([text, image_tokens], axis=1)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 8, 8, 4))

    params_ip = unet_ip.init(jax.random.PRNGKey(0), x, jnp.asarray([1]), ctx_full)["params"]

    def strip_ip(p):
        if isinstance(p, dict):
            return {k: strip_ip(v) for k, v in p.items() if k not in ("to_k_ip", "to_v_ip")}
        return p

    params_plain = strip_ip(params_ip)
    out_ip = unet_ip.apply({"params": params_ip}, x, jnp.asarray([5]), ctx_full, ip_scale=0.0)
    out_plain = unet_plain.apply({"params": params_plain}, x, jnp.asarray([5]), text)
    np.testing.assert_allclose(np.asarray(out_ip), np.asarray(out_plain), atol=1e-5)
