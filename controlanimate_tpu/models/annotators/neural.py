"""Neural annotators (HED, lineart, PidiNet/softedge, MLSD, OpenPose,
NormalBae, depth) — Flax ports, loaded lazily from local checkpoints.

Status: the conv-net edge detectors (HED, lineart, lineart_anime, softedge)
are implemented in `edge_nets.py`; pose/depth/normal/mlsd currently require
their checkpoints and fall back with a clear error when absent. The
reference equivalents are torch models from controlnet_aux
(reference: modules/controlresiduals_pipeline.py:56-63).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

_CACHE: dict = {}

ANNOTATOR_DIR = Path(os.environ.get("CONTROLANIMATE_ANNOTATOR_DIR", "models/annotators"))


def run(name: str, frames: np.ndarray) -> np.ndarray:
    if name == "softedge":
        from . import pidinet

        try:
            return pidinet.run(frames, ANNOTATOR_DIR)
        except FileNotFoundError:
            from . import edge_nets  # HED fallback when pidinet weights absent

            return edge_nets.run("hed", frames, ANNOTATOR_DIR)
    if name in ("hed", "lineart"):
        from . import edge_nets

        return edge_nets.run(name, frames, ANNOTATOR_DIR)
    if name == "lineart_anime":
        from . import lineart_anime

        return lineart_anime.run(frames, ANNOTATOR_DIR)
    if name == "depth":
        from . import depth

        return depth.run(frames)
    if name == "mlsd":
        from . import mlsd

        return mlsd.run(frames, ANNOTATOR_DIR)
    if name == "openpose":
        from . import openpose

        return openpose.run(frames, ANNOTATOR_DIR)
    if name == "normalbae":
        from . import normalbae

        return normalbae.run(frames)
    raise NotImplementedError(
        f"annotator {name!r}: checkpoint-backed Flax port pending; place "
        f"weights under {ANNOTATOR_DIR} (reference uses controlnet_aux's "
        "torch models, controlresiduals_pipeline.py:56-63)"
    )
