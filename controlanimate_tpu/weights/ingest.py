"""Checkpoint ingestion: every weight format of the reference's model zoo,
read into numpy trees (host) for conversion to JAX pytrees.

Format matrix (reference: SURVEY §5.4 / animatediff/utils/util.py:101-175):
  * HF-layout snapshots (safetensors or .bin) — SD base, ControlNets, CLIP
  * single-file `.ckpt` / `.safetensors` LDM checkpoints — VAE, DreamBooth
  * motion-module `.ckpt` torch pickles
  * LoRA / LCM-LoRA / motion-LoRA safetensors
  * IP-Adapter `.bin` / `.safetensors`
  * textual-inversion embeddings

torch (CPU wheel, baked in) is used only as a pickle decoder; everything is
converted to numpy immediately. Layout conversions to channels-last Flax
conventions happen in the per-model mapping modules.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np


def _to_numpy(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        t = t.detach().cpu()
        if t.dtype == torch.bfloat16:
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def load_safetensors(path: str | Path) -> dict[str, np.ndarray]:
    from safetensors import safe_open

    out: dict[str, np.ndarray] = {}
    with safe_open(str(path), framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out


def load_torch_pickle(path: str | Path) -> dict[str, np.ndarray]:
    """torch.load a .ckpt/.bin/.pt state dict (CPU) and convert to numpy.

    Handles both flat state dicts and LDM-style {'state_dict': ...} nesting
    (reference: animatediff/utils/util.py:112-121,126-128).
    """
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    flat: dict[str, np.ndarray] = {}

    def walk(prefix: str, d: Any):
        if isinstance(d, dict):
            for k, v in d.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            try:
                flat[prefix] = _to_numpy(d)
            except Exception:
                pass

    walk("", obj)
    return flat


def load_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Load any single-file checkpoint by extension."""
    path = Path(path)
    if path.suffix == ".safetensors":
        return load_safetensors(path)
    return load_torch_pickle(path)


def load_hf_component(snapshot: str | Path, component: str) -> tuple[dict, dict[str, np.ndarray]]:
    """Load (config.json, state_dict) for one component of an HF-layout
    snapshot directory, preferring safetensors over .bin."""
    d = Path(snapshot) / component
    if not d.is_dir():
        d = Path(snapshot)  # allow direct component dirs
    cfg_path = d / "config.json"
    config = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    candidates = sorted(d.glob("*.safetensors")) + sorted(d.glob("*.bin")) + sorted(
        d.glob("*.ckpt")
    )
    # sharded checkpoints: merge all shards
    state: dict[str, np.ndarray] = {}
    index = d / "diffusion_pytorch_model.safetensors.index.json"
    if not candidates and not index.exists():
        raise FileNotFoundError(f"no weight files under {d}")
    for c in candidates:
        state.update(load_state_dict(c))
    return config, state


# -- torch-layout -> flax-layout primitive conversions -----------------------

def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, *spatial) -> flax (*spatial, I, O);
    handles 1D/2D/3D convs by rank."""
    n = w.ndim
    return np.transpose(w, (*range(2, n), 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch linear weight (O, I) -> flax kernel (I, O)."""
    return np.transpose(w, (1, 0))
