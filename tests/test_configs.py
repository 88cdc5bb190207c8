"""The four shipped run profiles must parse with zero unknown keys and map
to the correct sampling setups (reference: configs/prompts/*.yaml)."""

from pathlib import Path

import pytest

from controlanimate_tpu.config import ArchConfig, RunConfig

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize("name,expect", [
    ("SampleConfig", dict(steps=30, scheduler="EulerDiscreteScheduler",
                          use_lcm=False, n_controlnets=4, guidance=7.5)),
    ("SampleConfigLCM", dict(steps=4, scheduler="LCMScheduler",
                             use_lcm=True, n_controlnets=0, guidance=7.5)),
    ("SampleConfigLCMLoRA", dict(steps=7, scheduler="LCMScheduler",
                                 use_lcm=False, n_controlnets=4, guidance=1.1)),
    ("SampleConfigIPAdapter", dict(steps=12, scheduler="LCMScheduler",
                                   use_lcm=False, n_controlnets=4, guidance=1.35)),
])
def test_sample_profiles(name, expect):
    cfg = RunConfig.from_yaml(ROOT / "configs" / "prompts" / f"{name}.yaml")
    assert cfg.extras == {}, f"unknown keys: {list(cfg.extras)}"
    assert cfg.steps == expect["steps"]
    assert cfg.scheduler == expect["scheduler"]
    assert cfg.use_lcm == expect["use_lcm"]
    assert len(cfg.controlnets) == expect["n_controlnets"]
    assert abs(cfg.guidance_scale - expect["guidance"]) < 1e-6
    assert cfg.frame_count == 16 and cfg.overlap_length == 8


def test_new_profiles_parse():
    """TPU-native extension profiles (txt2vid length, device mesh)."""
    t2v = RunConfig.from_yaml(ROOT / "configs/prompts/SampleConfigTxt2Vid.yaml")
    assert t2v.extras == {}
    assert t2v.total_frames == 48 and t2v.input_video_path == ""
    mesh = RunConfig.from_yaml(ROOT / "configs/prompts/SampleConfigMultiChip.yaml")
    assert mesh.extras == {}
    assert tuple(mesh.mesh_shape) == (4, 2)
    assert tuple(mesh.mesh_axes) == ("data", "context")
    assert mesh.parallel_segments == 4


def test_ipadapter_profile_flags():
    cfg = RunConfig.from_yaml(ROOT / "configs/prompts/SampleConfigIPAdapter.yaml")
    assert cfg.use_ipadapter and cfg.do_initial_generation and cfg.guess_mode


def test_unsupported_arch_flags_raise(tmp_path):
    """Unsupported arch variants must fail loudly instead of silently
    loading a different model (VERDICT r2)."""
    with pytest.raises(NotImplementedError, match="Vanilla"):
        ArchConfig(motion_module_type="Exotic")


def test_temporal_attention_flag_flows_to_unet_config(tmp_path):
    """unet_use_temporal_attention is supported (frame-axis attn sublayer
    after each spatial block's FFN; reference attention.py:240-251 — the
    flag is off in every shipped reference yaml)."""
    from controlanimate_tpu.models.unet3d import UNet3DConfig

    y = tmp_path / "arch.yaml"
    y.write_text(
        "unet_additional_kwargs:\n  unet_use_temporal_attention: true\n"
    )
    arch = ArchConfig.from_yaml(y)
    assert arch.unet_use_temporal_attention
    assert UNet3DConfig.from_arch(arch).temporal_attention


def test_cross_frame_attention_flag_flows_to_unet_config(tmp_path):
    """unet_use_cross_frame_attention is supported (sparse-causal attn1;
    the reference's own branch is dead code — attention.py:195 names an
    undefined `SparseCausalAttention2D`)."""
    from controlanimate_tpu.models.unet3d import UNet3DConfig

    y = tmp_path / "arch.yaml"
    y.write_text(
        "unet_additional_kwargs:\n  unet_use_cross_frame_attention: true\n"
    )
    arch = ArchConfig.from_yaml(y)
    assert arch.unet_use_cross_frame_attention
    ucfg = UNet3DConfig.from_arch(arch)
    assert ucfg.cross_frame_attention
    assert not UNet3DConfig.from_arch(ArchConfig()).cross_frame_attention


def test_clip_skip_key_parses():
    cfg = RunConfig.from_dict({"clip_skip": 2})
    assert cfg.clip_skip == 2 and cfg.extras == {}


@pytest.mark.parametrize("name,mid,maxlen,inflated", [
    ("inference-v1", False, 24, False),
    ("inference-v2", True, 32, True),
])
def test_inference_configs(name, mid, maxlen, inflated):
    arch = ArchConfig.from_yaml(ROOT / "configs" / "inference" / f"{name}.yaml")
    assert arch.motion_module_mid_block == mid
    assert arch.motion_module.temporal_position_encoding_max_len == maxlen
    assert arch.use_inflated_groupnorm == inflated
    assert arch.beta_schedule == "linear"
    assert abs(arch.beta_start - 0.00085) < 1e-9
