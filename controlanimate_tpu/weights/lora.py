"""LoRA fusing into torch-layout state dicts (pre-conversion).

Capability parity with the reference's LoRA stack
(reference: animatediff/utils/util.py:143-173 — diffusers load_lora_weights
+ fuse_lora for model/LCM LoRAs, convert_motion_lora_ckpt_to_diffusers for
motion LoRAs; convert_lora_safetensor_to_diffusers.py:52-116 weight-merge
W += alpha * up @ down).

Supported key formats:
  * Kohya/civitai: lora_unet_<path>_<to_q>.lora_up.weight / .lora_down.weight
    + .alpha scalars (underscored module paths)
  * peft/diffusers: unet.<path>.lora_A.weight / lora_B.weight
  * old diffusers attn-processor: <path>.processor.to_q_lora.up.weight
    (also the AnimateDiff motion-LoRA layout)

Fusing happens on the diffusers-layout *torch* state dict before layout
conversion, so one code path serves UNet, text encoder, and motion modules.
"""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np


def _kohya_to_module_path(name: str, known_keys: set[str]) -> str | None:
    """lora_unet_down_blocks_0_attentions_1_..._to_q -> dotted module path.

    Underscores are ambiguous (module names contain them), so resolve against
    the actual state-dict keys."""
    body = name.split(".", 1)[0]
    for prefix in ("lora_unet_", "lora_te_", "lora_te1_"):
        if body.startswith(prefix):
            body = body[len(prefix):]
            break
    # try progressively: replace '_' by '.' where it yields a real key prefix
    parts = body.split("_")
    # dynamic programming over join choices is overkill: try greedy from left
    candidates = {k.rsplit(".", 1)[0].replace(".", "_"): k.rsplit(".", 1)[0] for k in known_keys}
    if body in candidates:
        return candidates[body]
    return None


def extract_lora_deltas(
    lora_sd: dict[str, np.ndarray], target_sd_keys: set[str]
) -> dict[str, tuple[np.ndarray, np.ndarray, float]]:
    """Parse a LoRA state dict into {target_weight_key: (up, down, alpha/rank)}."""
    groups: dict[str, dict[str, np.ndarray]] = defaultdict(dict)
    alphas: dict[str, float] = {}

    for k, v in lora_sd.items():
        if k.endswith(".alpha"):
            alphas[k[: -len(".alpha")]] = float(np.asarray(v))
            continue
        m = re.match(r"(.*)\.lora_(up|down)\.weight$", k)
        if m:
            groups[m.group(1)]["up" if m.group(2) == "up" else "down"] = v
            continue
        m = re.match(r"(.*)\.lora_(A|B)\.weight$", k)
        if m:
            groups[m.group(1)]["down" if m.group(2) == "A" else "up"] = v
            continue
        m = re.match(r"(.*)\.processor\.(\w+)_lora\.(up|down)\.weight$", k)
        if m:
            base, attn_name = m.group(1), m.group(2)
            proj = attn_name.replace("to_out", "to_out.0")
            groups[f"{base}.{proj}"][m.group(3)] = v
            continue

    module_keys = {k[: -len(".weight")] for k in target_sd_keys if k.endswith(".weight")}
    out: dict[str, tuple[np.ndarray, np.ndarray, float]] = {}
    for name, uv in groups.items():
        if "up" not in uv or "down" not in uv:
            continue
        up, down = np.asarray(uv["up"], np.float32), np.asarray(uv["down"], np.float32)
        rank = down.shape[0]
        alpha = alphas.get(name, float(rank))
        # resolve the target module path
        target = None
        if name in module_keys:
            target = name
        else:
            resolved = _kohya_to_module_path(name, target_sd_keys)
            if resolved is not None and resolved in module_keys:
                target = resolved
        if target is None:
            continue
        out[target + ".weight"] = (up, down, alpha / rank)
    return out


def fuse_lora(
    sd: dict[str, np.ndarray],
    lora_sd: dict[str, np.ndarray],
    scale: float = 1.0,
) -> tuple[dict[str, np.ndarray], int]:
    """W += scale * (alpha/rank) * up @ down, in place on a copy.

    Returns (fused_sd, num_fused_layers)."""
    deltas = extract_lora_deltas(lora_sd, set(sd.keys()))
    out = dict(sd)
    for key, (up, down, a) in deltas.items():
        w = np.asarray(out[key], np.float32)
        if w.ndim == 4:  # conv: (O, I, kh, kw); lora usually rank-decomposed 1x1
            u = up.reshape(up.shape[0], -1)
            d = down.reshape(down.shape[0], -1)
            delta = (u @ d).reshape(w.shape)
        else:
            delta = up @ down
        out[key] = (w + scale * a * delta).astype(np.float32)
    return out, len(deltas)


def split_lora_by_component(
    lora_sd: dict[str, np.ndarray],
) -> dict[str, dict[str, np.ndarray]]:
    """Partition a combined LoRA file into unet / text-encoder parts by key
    prefix (diffusers convention 'unet.' / 'text_encoder.'; kohya
    'lora_unet_' / 'lora_te_')."""
    unet, te, other = {}, {}, {}
    for k, v in lora_sd.items():
        if k.startswith("unet.") :
            unet[k[len("unet."):]] = v
        elif k.startswith("text_encoder."):
            te[k[len("text_encoder."):]] = v
        elif k.startswith("lora_unet_"):
            unet[k] = v
        elif k.startswith(("lora_te_", "lora_te1_")):
            te[k] = v
        else:
            other[k] = v
    if other and not unet:
        unet = other  # bare unet LoRA
    return {"unet": unet, "text_encoder": te}
