"""Write a synthetic full-geometry model zoo (SD1.5 layout, random weights)
so the REAL CLI path — `python main.py --config ...` building every model
from disk — can be smoke-tested end to end without network egress or the
reference's checkpoint downloads (reference zoo layout: download.sh).

Weights are random (outputs are noise video), but every file format, key
layout, and geometry matches what the reference distributes: HF snapshot
(tokenizer/text_encoder/vae/unet), AnimateDiff motion-module torch ckpt,
optional ControlNet snapshot.

Usage: python scripts/make_synthetic_zoo.py <dest_dir> [--small] [--controlnet]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from controlanimate_tpu.models.tokenizer import bytes_to_unicode


def _save_safetensors(path: Path, sd: dict):
    from safetensors.numpy import save_file

    path.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(path))


def _tokenizer_files(d: Path) -> int:
    d.mkdir(parents=True, exist_ok=True)
    byte_vocab = {c: i for i, c in enumerate(bytes_to_unicode().values())}
    vocab = dict(byte_vocab)
    for c in list(byte_vocab):
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return len(vocab)


def _rand_like_mapping(mapping, shapes_by_fpath, rs, scale=0.02):
    """Generate a torch-layout state dict from a (tkey, fpath, kind) mapping
    table + flax shape tree."""
    sd = {}
    for tkey, fpath, kind in mapping:
        shp = shapes_by_fpath[fpath]
        if kind == "conv":
            shp = (shp[3], shp[2], shp[0], shp[1])  # HWIO -> OIHW
        elif kind == "dense":
            shp = (shp[1], shp[0])
        arr = rs.randn(*shp).astype(np.float32) * scale
        if tkey.endswith(".weight") and "norm" in tkey:
            arr = np.ones(shp, np.float32)  # norm scales at identity
        sd[tkey] = arr
    return sd


def _flat_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat_shapes(v, p))
        else:
            out[p] = tuple(v.shape)
    return out


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from controlanimate_tpu.config import MotionModuleConfig
    from controlanimate_tpu.models.clip import CLIPTextConfig
    from controlanimate_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
    from controlanimate_tpu.models.vae import AutoencoderKL
    from controlanimate_tpu.weights.controlnet_weights import controlnet_mapping
    from controlanimate_tpu.weights.unet_weights import unet_mapping
    from controlanimate_tpu.weights.vae_weights import vae_mapping

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dest = Path(args[0] if args else "models_synth")
    small = "--small" in sys.argv
    with_cn = "--controlnet" in sys.argv
    # --lcm: native-LCM UNet layout (LCM_Dreamshaper_v7: guidance embedding
    # via time_cond_proj_dim=256)
    lcm = "--lcm" in sys.argv
    rs = np.random.RandomState(0)

    if small:
        text_dim = 256
        ucfg = UNet3DConfig(
            block_out_channels=(32, 32, 64, 64), layers_per_block=2,
            attention_heads=4, cross_attention_dim=text_dim, norm_num_groups=8,
            time_cond_proj_dim=256 if lcm else None,
            motion=MotionModuleConfig(num_attention_heads=4),
        )
        vae_ch = (32, 64, 64, 64)
        vae_groups = 8
    else:
        text_dim = 768
        ucfg = UNet3DConfig(time_cond_proj_dim=256 if lcm else None)  # full SD1.5 + motion v2
        vae_ch = (128, 256, 512, 512)
        vae_groups = 32

    base = dest / "StableDiffusion"
    vocab_size = _tokenizer_files(base / "tokenizer")

    # text encoder (full CLIP-L geometry unless --small)
    tcfg = CLIPTextConfig(
        vocab_size=vocab_size,
        hidden_size=text_dim,
        num_layers=12 if not small else 4,
        num_heads=12 if not small else 4,
        intermediate_size=3072 if not small else 512,
        eos_token_id=vocab_size - 1,
    )
    te = {
        "text_model.embeddings.token_embedding.weight": rs.randn(vocab_size, tcfg.hidden_size) * 0.02,
        "text_model.embeddings.position_embedding.weight": rs.randn(77, tcfg.hidden_size) * 0.02,
        "text_model.final_layer_norm.weight": np.ones(tcfg.hidden_size),
        "text_model.final_layer_norm.bias": np.zeros(tcfg.hidden_size),
    }
    for i in range(tcfg.num_layers):
        p = f"text_model.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            te[f"{p}.self_attn.{proj}.weight"] = rs.randn(tcfg.hidden_size, tcfg.hidden_size) * 0.02
            te[f"{p}.self_attn.{proj}.bias"] = np.zeros(tcfg.hidden_size)
        te[f"{p}.layer_norm1.weight"] = np.ones(tcfg.hidden_size)
        te[f"{p}.layer_norm1.bias"] = np.zeros(tcfg.hidden_size)
        te[f"{p}.layer_norm2.weight"] = np.ones(tcfg.hidden_size)
        te[f"{p}.layer_norm2.bias"] = np.zeros(tcfg.hidden_size)
        te[f"{p}.mlp.fc1.weight"] = rs.randn(tcfg.intermediate_size, tcfg.hidden_size) * 0.02
        te[f"{p}.mlp.fc1.bias"] = np.zeros(tcfg.intermediate_size)
        te[f"{p}.mlp.fc2.weight"] = rs.randn(tcfg.hidden_size, tcfg.intermediate_size) * 0.02
        te[f"{p}.mlp.fc2.bias"] = np.zeros(tcfg.hidden_size)
    te = {k: np.asarray(v, np.float32) for k, v in te.items()}
    te_dir = base / "text_encoder"
    te_dir.mkdir(parents=True, exist_ok=True)
    (te_dir / "config.json").write_text(json.dumps({
        "vocab_size": vocab_size, "hidden_size": tcfg.hidden_size,
        "num_hidden_layers": tcfg.num_layers, "num_attention_heads": tcfg.num_heads,
        "intermediate_size": tcfg.intermediate_size,
        "max_position_embeddings": 77, "eos_token_id": tcfg.eos_token_id,
    }))
    _save_safetensors(te_dir / "model.safetensors", te)
    print(f"text_encoder: {len(te)} tensors")

    # VAE (shapes via eval_shape — no compute)
    vae = AutoencoderKL(block_out_channels=vae_ch, groups=vae_groups)
    vshapes = _flat_shapes(
        jax.eval_shape(
            lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        )["params"]
    )
    vae_sd = _rand_like_mapping(vae_mapping(vae_ch), vshapes, rs)
    vae_dir = base / "vae"
    vae_dir.mkdir(parents=True, exist_ok=True)
    (vae_dir / "config.json").write_text(json.dumps({
        "block_out_channels": list(vae_ch), "scaling_factor": 0.18215,
        "norm_num_groups": vae_groups,
    }))
    _save_safetensors(vae_dir / "diffusion_pytorch_model.safetensors", vae_sd)
    print(f"vae: {len(vae_sd)} tensors")

    # UNet (+ motion module ckpt)
    unet = UNet3DConditionModel(ucfg)
    init_kw = {}
    if ucfg.time_cond_proj_dim:
        init_kw["timestep_cond"] = jnp.zeros((1, ucfg.time_cond_proj_dim))
    ushapes = _flat_shapes(
        jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)), jnp.asarray([1]),
                jnp.zeros((1, 7, ucfg.cross_attention_dim)), **init_kw,
            )
        )["params"]
    )
    full_sd = _rand_like_mapping(unet_mapping(ucfg), ushapes, rs)
    sd_2d = {k: v for k, v in full_sd.items() if "motion_modules" not in k}
    sd_motion = {k: v for k, v in full_sd.items() if "motion_modules" in k}
    unet_dir = base / "unet"
    unet_dir.mkdir(parents=True, exist_ok=True)
    unet_json = {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": list(ucfg.block_out_channels),
        "layers_per_block": ucfg.layers_per_block,
        "attention_head_dim": ucfg.attention_heads,
        "cross_attention_dim": ucfg.cross_attention_dim,
        "norm_num_groups": ucfg.norm_num_groups,
    }
    if ucfg.time_cond_proj_dim:
        unet_json["time_cond_proj_dim"] = ucfg.time_cond_proj_dim
    (unet_dir / "config.json").write_text(json.dumps(unet_json))
    _save_safetensors(unet_dir / "diffusion_pytorch_model.safetensors", sd_2d)
    print(f"unet 2d: {len(sd_2d)} tensors")

    import torch

    mm_dir = dest / "Motion_Module"
    mm_dir.mkdir(parents=True, exist_ok=True)
    torch.save(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd_motion.items()},
        mm_dir / "mm_sd_v15_v2.ckpt",
    )
    print(f"motion module: {len(sd_motion)} tensors")

    if with_cn:
        cn_cfg = UNet3DConfig(**{**ucfg.__dict__, "use_motion_module": False})
        # reuse the UNet's down/mid shapes + probe the CN-specific heads
        from controlanimate_tpu.models.controlnet import ControlNetModel

        cn = ControlNetModel(cn_cfg)
        cshapes = _flat_shapes(
            jax.eval_shape(
                lambda: cn.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 4)),
                    jnp.asarray([1]), jnp.zeros((1, 7, cn_cfg.cross_attention_dim)),
                    jnp.zeros((1, 2, 64, 64, 3)),
                )
            )["params"]
        )
        cn_sd = _rand_like_mapping(controlnet_mapping(cn_cfg), cshapes, rs)
        cn_dir = dest / "ControlNet" / "sd-controlnet-canny"
        cn_dir.mkdir(parents=True, exist_ok=True)
        (cn_dir / "config.json").write_text(json.dumps({
            "block_out_channels": list(cn_cfg.block_out_channels),
        }))
        _save_safetensors(cn_dir / "diffusion_pytorch_model.safetensors", cn_sd)
        print(f"controlnet: {len(cn_sd)} tensors")

    print(f"zoo written to {dest}")


if __name__ == "__main__":
    main()
