"""Condition-map annotators for ControlNet inputs.

Capability parity with the reference's annotator zoo (reference:
modules/controlresiduals_pipeline.py:48-150: canny, MLSD, OpenPose, HED,
lineart, lineart-anime, NormalBae, PidiNet/softedge, depth) with the same
model-name substring dispatch.

The reference instantiates all eight torch detectors eagerly at pipeline
construction (:48-63); here annotators are resolved lazily per configured
ControlNet, and neural annotators are Flax modules whose weights load from
local checkpoints when present.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

_REGISTRY: dict[str, Callable[[np.ndarray], np.ndarray]] = {}


def register_annotator(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def resolve_annotator(controlnet_name: str) -> Callable[[np.ndarray], np.ndarray]:
    """Substring dispatch mirroring the reference
    (controlresiduals_pipeline.py:97-150)."""
    n = controlnet_name.lower()
    order = [
        ("canny", "canny"),
        ("mlsd", "mlsd"),
        ("openpose", "openpose"),
        ("hed", "hed"),
        ("lineart_anime", "lineart_anime"),
        ("anime", "lineart_anime"),
        ("lineart", "lineart"),
        ("normalbae", "normalbae"),
        ("softedge", "softedge"),
        ("pidi", "softedge"),
        ("depth", "depth"),
        ("scribble", "hed"),
    ]
    for sub, key in order:
        if sub in n and key in _REGISTRY:
            return _REGISTRY[key]
    raise KeyError(
        f"no annotator for ControlNet {controlnet_name!r}; "
        f"available: {sorted(_REGISTRY)}"
    )


def annotate_frames(controlnet_name: str, frames: np.ndarray) -> np.ndarray:
    """frames: (F, H, W, 3) uint8 -> condition maps (F, H, W, 3) float [0,1]."""
    fn = resolve_annotator(controlnet_name)
    out = fn(np.asarray(frames, np.uint8))
    return np.asarray(out, np.float32)


@register_annotator("canny")
def canny(frames: np.ndarray) -> np.ndarray:
    """Canny edges (reference: controlresiduals_pipeline.py:48-55 uses
    controlnet_aux CannyDetector = cv2.Canny(100, 200))."""
    import cv2

    out = []
    for f in frames:
        e = cv2.Canny(f, 100, 200)
        out.append(np.repeat(e[:, :, None], 3, axis=2))
    return np.stack(out).astype(np.float32) / 255.0


def _neural(name: str):
    def fn(frames: np.ndarray) -> np.ndarray:
        from . import neural

        return neural.run(name, frames)

    return fn


for _name in ("mlsd", "openpose", "hed", "lineart", "lineart_anime", "normalbae",
              "softedge", "depth"):
    _REGISTRY[_name] = _neural(_name)
