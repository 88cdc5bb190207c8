"""Depth annotator.

The reference uses an HF `depth-estimation` transformers pipeline (torch,
reference: modules/controlresiduals_pipeline.py:63; note its depth branch is
buggy — it feeds the raw image instead of the depth map to the ControlNet,
:140-145. This implementation feeds the actual depth map.)

Flax-first: plain-ViT DPT (dpt.py) and DPT-hybrid (dpt_hybrid.py) both run
on device from a local checkpoint directory (CONTROLANIMATE_DEPTH_MODEL or
models/annotators/depth); only unrecognized layouts (e.g. GLPN) fall back to
host torch via transformers.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_CACHE: dict = {}


def run(frames: np.ndarray) -> np.ndarray:
    """(F, H, W, 3) uint8 -> (F, H, W, 3) float [0,1] normalized depth."""
    model_dir = Path(os.environ.get("CONTROLANIMATE_DEPTH_MODEL", "models/annotators/depth"))
    if not model_dir.exists():
        raise FileNotFoundError(
            f"depth annotator needs a local DPT/GLPN checkpoint at {model_dir}"
        )
    # prefer the on-device Flax ports (plain-ViT and hybrid DPT, both
    # golden-tested against transformers)
    try:
        from . import dpt

        return dpt.run_flax(frames, model_dir)
    except (FileNotFoundError, KeyError):
        pass
    try:
        from . import dpt_hybrid

        return dpt_hybrid.run_flax(frames, model_dir)
    except (FileNotFoundError, KeyError):
        pass
    try:
        from . import glpn

        return glpn.run_flax(frames, model_dir)
    except (FileNotFoundError, KeyError):
        pass
    if "model" not in _CACHE:
        import torch
        from transformers import AutoImageProcessor, AutoModelForDepthEstimation

        _CACHE["proc"] = AutoImageProcessor.from_pretrained(str(model_dir))
        _CACHE["model"] = AutoModelForDepthEstimation.from_pretrained(str(model_dir)).eval()
    import torch

    proc, model = _CACHE["proc"], _CACHE["model"]
    F, H, W, _ = frames.shape
    out = []
    with torch.no_grad():
        inputs = proc(images=list(frames), return_tensors="pt")
        depth = model(**inputs).predicted_depth  # (F, h, w)
        depth = torch.nn.functional.interpolate(
            depth[:, None], size=(H, W), mode="bicubic", align_corners=False
        )[:, 0].numpy()
    for d in depth:
        d = (d - d.min()) / max(d.max() - d.min(), 1e-8)
        out.append(np.repeat(d[:, :, None], 3, axis=2))
    return np.stack(out).astype(np.float32)
