"""ControlNet torch-state-dict <-> Flax param mapping (diffusers layout,
e.g. lllyasviel/control_v11p_sd15_* — reference loads these at
modules/controlresiduals_pipeline.py:30-38)."""

from __future__ import annotations

from typing import Iterator

import numpy as np

from ..models.unet3d import UNet3DConfig
from .unet_weights import (
    _convert,
    _resnet_entries,
    _set_path,
    _spatial_transformer_entries,
)


def controlnet_mapping(cfg: UNet3DConfig) -> Iterator[tuple[str, str, str]]:
    yield "conv_in.weight", "conv_in/conv/kernel", "conv"
    yield "conv_in.bias", "conv_in/conv/bias", "raw"
    yield "time_embedding.linear_1.weight", "time_embedding/linear_1/kernel", "dense"
    yield "time_embedding.linear_1.bias", "time_embedding/linear_1/bias", "raw"
    yield "time_embedding.linear_2.weight", "time_embedding/linear_2/kernel", "dense"
    yield "time_embedding.linear_2.bias", "time_embedding/linear_2/bias", "raw"

    ce = "controlnet_cond_embedding"
    yield f"{ce}.conv_in.weight", f"{ce}/conv_in/conv/kernel", "conv"
    yield f"{ce}.conv_in.bias", f"{ce}/conv_in/conv/bias", "raw"
    for b in range(6):
        yield f"{ce}.blocks.{b}.weight", f"{ce}/blocks_{b}/conv/kernel", "conv"
        yield f"{ce}.blocks.{b}.bias", f"{ce}/blocks_{b}/conv/bias", "raw"
    yield f"{ce}.conv_out.weight", f"{ce}/conv_out/conv/kernel", "conv"
    yield f"{ce}.conv_out.bias", f"{ce}/conv_out/conv/bias", "raw"

    n_down = len(cfg.down_block_types)
    n_res = 0
    for i, bt in enumerate(cfg.down_block_types):
        has_cross = bt.startswith("CrossAttn")
        in_ch = cfg.block_out_channels[max(i - 1, 0)]
        out_ch = cfg.block_out_channels[i]
        for j in range(cfg.layers_per_block):
            shortcut = (j == 0) and (in_ch != out_ch)
            yield from _resnet_entries(
                f"down_blocks.{i}.resnets.{j}", f"down_blocks_{i}_resnets_{j}", shortcut
            )
            if has_cross:
                yield from _spatial_transformer_entries(
                    f"down_blocks.{i}.attentions.{j}", f"down_blocks_{i}_attentions_{j}"
                )
            n_res += 1
        if i < n_down - 1:
            yield (
                f"down_blocks.{i}.downsamplers.0.conv.weight",
                f"down_blocks_{i}_downsamplers_0/conv/conv/kernel",
                "conv",
            )
            yield (
                f"down_blocks.{i}.downsamplers.0.conv.bias",
                f"down_blocks_{i}_downsamplers_0/conv/conv/bias",
                "raw",
            )
            n_res += 1

    yield from _resnet_entries("mid_block.resnets.0", "mid_block_resnets_0", False)
    yield from _spatial_transformer_entries("mid_block.attentions.0", "mid_block_attentions_0")
    yield from _resnet_entries("mid_block.resnets.1", "mid_block_resnets_1", False)

    for idx in range(n_res + 1):  # +1 for conv_in residual
        yield (
            f"controlnet_down_blocks.{idx}.weight",
            f"controlnet_down_blocks_{idx}/conv/kernel",
            "conv",
        )
        yield (
            f"controlnet_down_blocks.{idx}.bias",
            f"controlnet_down_blocks_{idx}/conv/bias",
            "raw",
        )
    yield "controlnet_mid_block.weight", "controlnet_mid_block/conv/kernel", "conv"
    yield "controlnet_mid_block.bias", "controlnet_mid_block/conv/bias", "raw"


def controlnet_params_from_torch(
    sd: dict[str, np.ndarray], cfg: UNet3DConfig
) -> dict:
    params: dict = {}
    for tkey, fpath, kind in controlnet_mapping(cfg):
        if tkey not in sd:
            raise KeyError(f"missing ControlNet weight: {tkey}")
        _set_path(params, fpath, _convert(kind, np.asarray(sd[tkey])))
    return params
