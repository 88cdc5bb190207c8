"""Weight-mapping round-trip and coverage tests for the UNet3D."""

import jax
import jax.numpy as jnp
import numpy as np

from controlanimate_tpu.config import MotionModuleConfig
from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from controlanimate_tpu.weights.unet_weights import (
    unet_mapping,
    unet_params_from_torch,
    unet_params_to_torch,
)

TINY = UNet3DConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
    up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
    attention_heads=4,
    cross_attention_dim=24,
    norm_num_groups=8,
    motion=MotionModuleConfig(num_attention_heads=4, temporal_position_encoding_max_len=8),
)


def _leaf_items(tree, prefix=""):
    out = {}
    for k in sorted(tree):
        v = tree[k]
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_leaf_items(v, p))
        else:
            out[p] = v
    return out


def _leaf_paths(tree, prefix=""):
    return list(_leaf_items(tree, prefix))


def init_params(cfg=TINY):
    model = UNet3DConditionModel(cfg)
    x = jnp.zeros((1, 2, 8, 8, 4))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    return model.init(jax.random.PRNGKey(0), x, jnp.asarray([1]), ctx)["params"]


def test_mapping_covers_every_param():
    """Every leaf of the flax tree must appear in the mapping table —
    otherwise real checkpoints would silently leave params at random init."""
    params = init_params()
    mapped = {fpath for _, fpath, _ in unet_mapping(TINY)}
    leaves = set(_leaf_paths(params))
    unmapped = leaves - mapped
    assert not unmapped, f"unmapped params: {sorted(unmapped)[:10]}"
    phantom = mapped - leaves
    assert not phantom, f"mapping names nonexistent params: {sorted(phantom)[:10]}"


def test_roundtrip_torch_flax():
    params = init_params()
    # randomize so zeros don't hide transpose bugs
    params = jax.tree_util.tree_map(
        lambda a: np.random.RandomState(a.size % 1234).randn(*a.shape).astype(np.float32),
        params,
    )
    sd = unet_params_to_torch(params, TINY)
    # split into "2d" and motion keys the way real checkpoints arrive
    sd_2d = {k: v for k, v in sd.items() if "motion_modules" not in k}
    sd_motion = {k: v for k, v in sd.items() if "motion_modules" in k}
    rebuilt, missing = unet_params_from_torch(sd_2d, TINY, motion_sd=sd_motion)
    assert not missing
    flat_a = _leaf_items(params)
    flat_b = _leaf_items(rebuilt)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=k)


def test_2d_only_load_leaves_motion_at_init():
    """from_pretrained_2d semantics: 2D weights load, motion modules keep
    their (identity) initialization (reference: unet.py:623-669)."""
    params = init_params()
    sd = unet_params_to_torch(params, TINY)
    sd_2d = {k: v for k, v in sd.items() if "motion_modules" not in k}
    rebuilt, missing = unet_params_from_torch(sd_2d, TINY, init_params=params)
    assert all("motion_modules" in m for m in missing)
    assert missing  # some motion params were left at init
    # model still runs and equals the full-params model at init (identity motion)
    model = UNet3DConditionModel(TINY)
    x = jnp.ones((1, 2, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 24))
    out = model.apply({"params": rebuilt}, x, jnp.asarray([3]), ctx)
    assert out.shape == x.shape


def test_expected_diffusers_key_names():
    """Spot-check the table against known diffusers SD1.5 key spellings."""
    keys = {t for t, _, _ in unet_mapping(TINY)}
    expected = [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.proj_out.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.resnets.0.conv1.weight",
        "mid_block.attentions.0.norm.weight",
        "up_blocks.1.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.proj_in.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.attention_blocks.0.to_q.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.norms.0.weight",
        "down_blocks.0.motion_modules.0.temporal_transformer.transformer_blocks.0.ff_norm.weight",
    ]
    for e in expected:
        assert e in keys, e
