"""VAE torch-state-dict <-> Flax param mapping (diffusers AutoencoderKL
layout — the reference loads this from the SD snapshot or a single-file
checkpoint, modules/controlanimate_pipeline.py:37-40).

Handles both modern diffusers attention naming (to_q/to_k/to_v/to_out.0) and
the legacy (query/key/value/proj_attn) spelling found in older exports.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from .ingest import conv_kernel, dense_kernel
from .unet_weights import _set_path


def _conv(t, f):
    yield f"{t}.weight", f"{f}/kernel", "conv"
    yield f"{t}.bias", f"{f}/bias", "raw"


def _gn(t, f):
    yield f"{t}.weight", f"{f}/scale", "raw"
    yield f"{t}.bias", f"{f}/bias", "raw"


def _resblock(t, f, has_shortcut):
    yield from _gn(f"{t}.norm1", f"{f}/norm1")
    yield from _conv(f"{t}.conv1", f"{f}/conv1")
    yield from _gn(f"{t}.norm2", f"{f}/norm2")
    yield from _conv(f"{t}.conv2", f"{f}/conv2")
    if has_shortcut:
        yield from _conv(f"{t}.conv_shortcut", f"{f}/conv_shortcut")


def _attnblock(t, f):
    yield from _gn(f"{t}.group_norm", f"{f}/group_norm")
    for name in ("to_q", "to_k", "to_v"):
        yield f"{t}.{name}.weight", f"{f}/{name}/kernel", "dense"
        yield f"{t}.{name}.bias", f"{f}/{name}/bias", "raw"
    yield f"{t}.to_out.0.weight", f"{f}/to_out_0/kernel", "dense"
    yield f"{t}.to_out.0.bias", f"{f}/to_out_0/bias", "raw"


def vae_mapping(
    block_out_channels=(128, 256, 512, 512),
) -> Iterator[tuple[str, str, str]]:
    ch = list(block_out_channels)
    # encoder
    yield from _conv("encoder.conv_in", "encoder/conv_in")
    for i, c in enumerate(ch):
        in_ch = ch[max(i - 1, 0)]
        for j in range(2):
            shortcut = (j == 0) and (in_ch != c)
            yield from _resblock(
                f"encoder.down_blocks.{i}.resnets.{j}", f"encoder/down_{i}_res_{j}", shortcut
            )
        if i < len(ch) - 1:
            yield from _conv(
                f"encoder.down_blocks.{i}.downsamplers.0.conv", f"encoder/down_{i}_downsample/conv"
            )
    yield from _resblock("encoder.mid_block.resnets.0", "encoder/mid_res_0", False)
    yield from _attnblock("encoder.mid_block.attentions.0", "encoder/mid_attn")
    yield from _resblock("encoder.mid_block.resnets.1", "encoder/mid_res_1", False)
    yield from _gn("encoder.conv_norm_out", "encoder/conv_norm_out")
    yield from _conv("encoder.conv_out", "encoder/conv_out")

    # decoder
    rch = list(reversed(ch))  # (512,512,256,128)
    yield from _conv("decoder.conv_in", "decoder/conv_in")
    yield from _resblock("decoder.mid_block.resnets.0", "decoder/mid_res_0", False)
    yield from _attnblock("decoder.mid_block.attentions.0", "decoder/mid_attn")
    yield from _resblock("decoder.mid_block.resnets.1", "decoder/mid_res_1", False)
    for i, c in enumerate(rch):
        in_ch = rch[max(i - 1, 0)]
        for j in range(3):
            shortcut = (j == 0) and (in_ch != c)
            yield from _resblock(
                f"decoder.up_blocks.{i}.resnets.{j}", f"decoder/up_{i}_res_{j}", shortcut
            )
        if i < len(rch) - 1:
            yield from _conv(
                f"decoder.up_blocks.{i}.upsamplers.0.conv", f"decoder/up_{i}_upsample/conv"
            )
    yield from _gn("decoder.conv_norm_out", "decoder/conv_norm_out")
    yield from _conv("decoder.conv_out", "decoder/conv_out")

    yield from _conv("quant_conv", "quant_conv")
    yield from _conv("post_quant_conv", "post_quant_conv")


_LEGACY_ATTN = {
    ".query.": ".to_q.",
    ".key.": ".to_k.",
    ".value.": ".to_v.",
    ".proj_attn.": ".to_out.0.",
}


def normalize_vae_keys(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for old, new in _LEGACY_ATTN.items():
            if old in k:
                k = k.replace(old, new)
        # legacy attention projections may be (C, C, 1, 1) convs
        if any(t in k for t in (".to_q.", ".to_k.", ".to_v.", ".to_out.0.")):
            if k.endswith("weight") and v.ndim == 4:
                v = v[:, :, 0, 0]
        out[k] = v
    return out


def vae_params_from_torch(sd: dict[str, np.ndarray], block_out_channels=(128, 256, 512, 512)) -> dict:
    sd = normalize_vae_keys(sd)
    params: dict = {}
    for tkey, fpath, kind in vae_mapping(block_out_channels):
        if tkey not in sd:
            raise KeyError(f"missing VAE weight: {tkey}")
        arr = np.asarray(sd[tkey])
        if kind == "conv":
            arr = conv_kernel(arr)
        elif kind == "dense":
            arr = dense_kernel(arr)
        _set_path(params, fpath, arr)
    return params
