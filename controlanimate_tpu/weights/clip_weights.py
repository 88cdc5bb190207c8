"""HF CLIP torch state-dict -> Flax param tree mapping.

Covers the text encoder the reference loads from the SD snapshot
(reference: modules/controlanimate_pipeline.py:34-35) and the vision tower
used by IP-Adapter (reference: modules/ip_adapter.py:78-81).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .ingest import conv_kernel, dense_kernel


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _dense(sd, prefix, bias=True):
    p = {"kernel": dense_kernel(sd[f"{prefix}.weight"])}
    if bias:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _layer(sd, prefix):
    return {
        "self_attn": {
            "q_proj": _dense(sd, f"{prefix}.self_attn.q_proj"),
            "k_proj": _dense(sd, f"{prefix}.self_attn.k_proj"),
            "v_proj": _dense(sd, f"{prefix}.self_attn.v_proj"),
            "out_proj": _dense(sd, f"{prefix}.self_attn.out_proj"),
        },
        "layer_norm1": _ln(sd, f"{prefix}.layer_norm1"),
        "layer_norm2": _ln(sd, f"{prefix}.layer_norm2"),
        "mlp_fc1": _dense(sd, f"{prefix}.mlp.fc1"),
        "mlp_fc2": _dense(sd, f"{prefix}.mlp.fc2"),
    }


def text_params_from_torch(
    sd: dict[str, np.ndarray],
    num_layers: int,
    extra_embeddings: Optional[np.ndarray] = None,
) -> dict:
    """Map an HF CLIPTextModel state dict to CLIPTextModel flax params.

    `extra_embeddings` (K, hidden) rows are textual-inversion vectors appended
    to the token embedding table (capability of reference
    load_textual_inversion, modules/controlanimate_pipeline.py:118)."""
    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    tok = sd[f"{pre}embeddings.token_embedding.weight"]
    if extra_embeddings is not None and len(extra_embeddings):
        tok = np.concatenate([tok, np.asarray(extra_embeddings, tok.dtype)], axis=0)
    params = {
        "token_embedding": {"embedding": tok},
        "position_embedding": {"embedding": sd[f"{pre}embeddings.position_embedding.weight"]},
        "final_layer_norm": _ln(sd, f"{pre}final_layer_norm"),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _layer(sd, f"{pre}encoder.layers.{i}")
    return params


def vision_params_from_torch(sd: dict[str, np.ndarray], num_layers: int) -> dict:
    """Map an HF CLIPVisionModelWithProjection state dict to flax params."""
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    params = {
        "patch_embedding": {
            "kernel": conv_kernel(sd[f"{pre}embeddings.patch_embedding.weight"])
        },
        "class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "position_embedding": {"embedding": sd[f"{pre}embeddings.position_embedding.weight"]},
        "pre_layrnorm": _ln(sd, f"{pre}pre_layrnorm"),
        "post_layernorm": _ln(sd, f"{pre}post_layernorm"),
        "visual_projection": _dense(sd, "visual_projection", bias=False),
    }
    for i in range(num_layers):
        params[f"layers_{i}"] = _layer(sd, f"{pre}encoder.layers.{i}")
    return params
