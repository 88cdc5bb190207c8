"""UNet torch-state-dict <-> Flax param mapping.

Covers:
  * diffusers-layout SD UNet weights (2D) loaded non-strictly into the 3D
    graph (capability of reference `from_pretrained_2d`,
    animatediff/models/unet.py:623-669);
  * AnimateDiff motion-module checkpoints overlaid on top (reference:
    animatediff/utils/util.py:112-121 filters `motion_modules.` keys);
  * IP-Adapter to_k_ip/to_v_ip projections injected into cross-attention
    (reference: modules/ip_adapter.py:136-185 — note the reference has to
    renumber keys because torch module iteration order shifts with motion
    modules; here attn2 modules are addressed by structural path, so the
    remap is by construction).

The mapping is a declarative (torch_key, flax_path, kind) table generated
from the config, so torch->flax and flax->torch are the same data.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from ..models.unet3d import UNet3DConfig
from .ingest import conv_kernel, dense_kernel

# kinds: conv (OIHW->HWIO), dense (transpose), dense_nobias, raw (1:1 vector)


def _resnet_entries(tprefix: str, fprefix: str, has_shortcut: bool):
    yield f"{tprefix}.norm1.weight", f"{fprefix}/norm1/norm/scale", "raw"
    yield f"{tprefix}.norm1.bias", f"{fprefix}/norm1/norm/bias", "raw"
    yield f"{tprefix}.conv1.weight", f"{fprefix}/conv1/conv/kernel", "conv"
    yield f"{tprefix}.conv1.bias", f"{fprefix}/conv1/conv/bias", "raw"
    yield f"{tprefix}.time_emb_proj.weight", f"{fprefix}/time_emb_proj/kernel", "dense"
    yield f"{tprefix}.time_emb_proj.bias", f"{fprefix}/time_emb_proj/bias", "raw"
    yield f"{tprefix}.norm2.weight", f"{fprefix}/norm2/norm/scale", "raw"
    yield f"{tprefix}.norm2.bias", f"{fprefix}/norm2/norm/bias", "raw"
    yield f"{tprefix}.conv2.weight", f"{fprefix}/conv2/conv/kernel", "conv"
    yield f"{tprefix}.conv2.bias", f"{fprefix}/conv2/conv/bias", "raw"
    if has_shortcut:
        yield f"{tprefix}.conv_shortcut.weight", f"{fprefix}/conv_shortcut/conv/kernel", "conv"
        yield f"{tprefix}.conv_shortcut.bias", f"{fprefix}/conv_shortcut/conv/bias", "raw"


def _attn_entries(tprefix: str, fprefix: str):
    yield f"{tprefix}.to_q.weight", f"{fprefix}/to_q/kernel", "dense"
    yield f"{tprefix}.to_k.weight", f"{fprefix}/to_k/kernel", "dense"
    yield f"{tprefix}.to_v.weight", f"{fprefix}/to_v/kernel", "dense"
    yield f"{tprefix}.to_out.0.weight", f"{fprefix}/to_out_0/kernel", "dense"
    yield f"{tprefix}.to_out.0.bias", f"{fprefix}/to_out_0/bias", "raw"


def _ln_entries(tprefix: str, fprefix: str):
    yield f"{tprefix}.weight", f"{fprefix}/scale", "raw"
    yield f"{tprefix}.bias", f"{fprefix}/bias", "raw"


def _ff_entries(tprefix: str, fprefix: str):
    yield f"{tprefix}.net.0.proj.weight", f"{fprefix}/net_0/proj/kernel", "dense"
    yield f"{tprefix}.net.0.proj.bias", f"{fprefix}/net_0/proj/bias", "raw"
    yield f"{tprefix}.net.2.weight", f"{fprefix}/net_2/kernel", "dense"
    yield f"{tprefix}.net.2.bias", f"{fprefix}/net_2/bias", "raw"


def _spatial_transformer_entries(tprefix: str, fprefix: str, depth: int = 1,
                                 temporal: bool = False):
    yield f"{tprefix}.norm.weight", f"{fprefix}/norm/scale", "raw"
    yield f"{tprefix}.norm.bias", f"{fprefix}/norm/bias", "raw"
    yield f"{tprefix}.proj_in.weight", f"{fprefix}/proj_in/kernel", "conv"
    yield f"{tprefix}.proj_in.bias", f"{fprefix}/proj_in/bias", "raw"
    for d in range(depth):
        tb, fb = f"{tprefix}.transformer_blocks.{d}", f"{fprefix}/transformer_blocks_{d}"
        yield from _attn_entries(f"{tb}.attn1", f"{fb}/attn1")
        yield from _attn_entries(f"{tb}.attn2", f"{fb}/attn2")
        yield from _ln_entries(f"{tb}.norm1", f"{fb}/norm1")
        yield from _ln_entries(f"{tb}.norm2", f"{fb}/norm2")
        yield from _ln_entries(f"{tb}.norm3", f"{fb}/norm3")
        yield from _ff_entries(f"{tb}.ff", f"{fb}/ff")
        if temporal:  # unet_use_temporal_attention sublayer
            yield from _attn_entries(f"{tb}.attn_temp", f"{fb}/attn_temp")
            yield from _ln_entries(f"{tb}.norm_temp", f"{fb}/norm_temp")
    yield f"{tprefix}.proj_out.weight", f"{fprefix}/proj_out/kernel", "conv"
    yield f"{tprefix}.proj_out.bias", f"{fprefix}/proj_out/bias", "raw"


def _motion_module_entries(tprefix: str, fprefix: str, cfg: UNet3DConfig):
    tt = f"{tprefix}.temporal_transformer"
    yield f"{tt}.norm.weight", f"{fprefix}/norm/scale", "raw"
    yield f"{tt}.norm.bias", f"{fprefix}/norm/bias", "raw"
    yield f"{tt}.proj_in.weight", f"{fprefix}/proj_in/kernel", "dense"
    yield f"{tt}.proj_in.bias", f"{fprefix}/proj_in/bias", "raw"
    for i in range(cfg.motion.num_transformer_block):
        tb = f"{tt}.transformer_blocks.{i}"
        fb = f"{fprefix}/transformer_blocks_{i}"
        for k in range(len(cfg.motion.attention_block_types)):
            yield from _attn_entries(
                f"{tb}.attention_blocks.{k}", f"{fb}/attention_blocks_{k}/attention"
            )
            yield from _ln_entries(f"{tb}.norms.{k}", f"{fb}/attention_blocks_{k}/norm")
        yield from _ln_entries(f"{tb}.ff_norm", f"{fb}/norm")
        yield from _ff_entries(f"{tb}.ff", f"{fb}/ff")
    yield f"{tt}.proj_out.weight", f"{fprefix}/proj_out/kernel", "dense"
    yield f"{tt}.proj_out.bias", f"{fprefix}/proj_out/bias", "raw"


def unet_mapping(cfg: UNet3DConfig, include_motion: bool = True) -> Iterator[tuple[str, str, str]]:
    """Yield the full (torch_key, flax_path, kind) table for a config."""
    yield "conv_in.weight", "conv_in/conv/kernel", "conv"
    yield "conv_in.bias", "conv_in/conv/bias", "raw"
    yield "time_embedding.linear_1.weight", "time_embedding/linear_1/kernel", "dense"
    yield "time_embedding.linear_1.bias", "time_embedding/linear_1/bias", "raw"
    yield "time_embedding.linear_2.weight", "time_embedding/linear_2/kernel", "dense"
    yield "time_embedding.linear_2.bias", "time_embedding/linear_2/bias", "raw"
    if cfg.time_cond_proj_dim:
        yield "time_embedding.cond_proj.weight", "time_embedding/cond_proj/kernel", "dense"

    n_down = len(cfg.down_block_types)
    for i, bt in enumerate(cfg.down_block_types):
        has_cross = bt == "CrossAttnDownBlock3D"
        in_ch = cfg.block_out_channels[max(i - 1, 0)]
        out_ch = cfg.block_out_channels[i]
        use_motion = (
            include_motion
            and cfg.use_motion_module
            and (2**i) in cfg.motion_module_resolutions
            and not cfg.motion_module_decoder_only
        )
        for j in range(cfg.layers_per_block):
            shortcut = (j == 0) and (in_ch != out_ch)
            yield from _resnet_entries(
                f"down_blocks.{i}.resnets.{j}", f"down_blocks_{i}_resnets_{j}", shortcut
            )
            if has_cross:
                yield from _spatial_transformer_entries(
                    f"down_blocks.{i}.attentions.{j}", f"down_blocks_{i}_attentions_{j}",
                    temporal=cfg.temporal_attention,
                )
            if use_motion:
                yield from _motion_module_entries(
                    f"down_blocks.{i}.motion_modules.{j}",
                    f"down_blocks_{i}_motion_modules_{j}",
                    cfg,
                )
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

    # mid block
    yield from _resnet_entries("mid_block.resnets.0", "mid_block_resnets_0", False)
    yield from _spatial_transformer_entries(
        "mid_block.attentions.0", "mid_block_attentions_0",
        temporal=cfg.temporal_attention,
    )
    if include_motion and cfg.use_motion_module and cfg.motion_module_mid_block:
        yield from _motion_module_entries(
            "mid_block.motion_modules.0", "mid_block_motion_modules_0", cfg
        )
    yield from _resnet_entries("mid_block.resnets.1", "mid_block_resnets_1", False)

    # up blocks
    reversed_ch = list(reversed(cfg.block_out_channels))
    for i, bt in enumerate(cfg.up_block_types):
        has_cross = bt == "CrossAttnUpBlock3D"
        out_ch = reversed_ch[i]
        resolution = 2 ** (len(cfg.up_block_types) - 1 - i)
        use_motion = (
            include_motion and cfg.use_motion_module and resolution in cfg.motion_module_resolutions
        )
        for j in range(cfg.layers_per_block + 1):
            yield from _resnet_entries(
                f"up_blocks.{i}.resnets.{j}", f"up_blocks_{i}_resnets_{j}", True
            )
            if has_cross:
                yield from _spatial_transformer_entries(
                    f"up_blocks.{i}.attentions.{j}", f"up_blocks_{i}_attentions_{j}",
                    temporal=cfg.temporal_attention,
                )
            if use_motion:
                yield from _motion_module_entries(
                    f"up_blocks.{i}.motion_modules.{j}", f"up_blocks_{i}_motion_modules_{j}", cfg
                )
        if i < len(cfg.up_block_types) - 1:
            yield (
                f"up_blocks.{i}.upsamplers.0.conv.weight",
                f"up_blocks_{i}_upsamplers_0/conv/conv/kernel",
                "conv",
            )
            yield (
                f"up_blocks.{i}.upsamplers.0.conv.bias",
                f"up_blocks_{i}_upsamplers_0/conv/conv/bias",
                "raw",
            )

    yield "conv_norm_out.weight", "conv_norm_out/norm/scale", "raw"
    yield "conv_norm_out.bias", "conv_norm_out/norm/bias", "raw"
    yield "conv_out.weight", "conv_out/conv/kernel", "conv"
    yield "conv_out.bias", "conv_out/conv/bias", "raw"


def _convert(kind: str, arr: np.ndarray) -> np.ndarray:
    if kind == "conv":
        return conv_kernel(arr)
    if kind == "dense":
        return dense_kernel(arr)
    return arr


def _set_path(tree: dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _get_path(tree: dict, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


def unet_params_from_torch(
    sd_2d: dict[str, np.ndarray],
    cfg: UNet3DConfig,
    motion_sd: Optional[dict[str, np.ndarray]] = None,
    init_params: Optional[dict] = None,
    strict_2d: bool = True,
) -> tuple[dict, list[str]]:
    """Build the flax param tree from a 2D UNet state dict (+ optional motion
    module state dict). Parameters with no source (motion modules when
    motion_sd is None; IP projections) are taken from `init_params`.

    Returns (params, missing_paths). Non-strict by design for the 2D->3D
    inflation, mirroring reference load_state_dict(strict=False)
    (unet.py:662-667)."""
    params: dict = {} if init_params is None else jax_tree_copy(init_params)
    missing: list[str] = []
    motion_sd = motion_sd or {}
    # motion checkpoints are keyed like the unet but may carry module prefixes
    norm_motion = {}
    for k, v in motion_sd.items():
        k = k.replace("module.", "")
        norm_motion[k] = v

    for tkey, fpath, kind in unet_mapping(cfg):
        src = None
        if "motion_modules" in tkey:
            src = norm_motion.get(tkey)
        else:
            src = sd_2d.get(tkey)
            if src is None:
                src = norm_motion.get(tkey)
        if src is None:
            missing.append(fpath)
            if strict_2d and "motion_modules" not in tkey:
                raise KeyError(f"missing UNet weight: {tkey}")
            continue
        _set_path(params, fpath, _convert(kind, np.asarray(src)))
    return params, missing


def unet_params_to_torch(params: dict, cfg: UNet3DConfig) -> dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests and torch export)."""
    out: dict[str, np.ndarray] = {}
    for tkey, fpath, kind in unet_mapping(cfg):
        try:
            arr = np.asarray(_get_path(params, fpath))
        except KeyError:
            continue
        if kind == "conv":
            arr = np.transpose(arr, (3, 2, 0, 1))
        elif kind == "dense":
            arr = np.transpose(arr, (1, 0))
        out[tkey] = arr
    return out


def jax_tree_copy(tree):
    if isinstance(tree, dict):
        return {k: jax_tree_copy(v) for k, v in tree.items()}
    return tree
