"""Textual-inversion embedding loading.

Capability parity with the reference's easynegative TI usage
(reference: modules/controlanimate_pipeline.py:118-121 load_textual_inversion
+ maybe_convert_prompt). Supports safetensors ({'emb_params': (K, D)}) and
torch-pickle ({'string_to_param': {'*': (K, D)}}) formats.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .ingest import load_state_dict


def load_textual_inversion(path: str | Path) -> np.ndarray:
    """Returns the (K, D) embedding matrix for a TI file."""
    sd = load_state_dict(path)
    if "emb_params" in sd:
        emb = sd["emb_params"]
    elif "string_to_param.*" in sd:
        emb = sd["string_to_param.*"]
    else:
        # single-tensor files: take the first 2D array
        cands = [v for v in sd.values() if np.asarray(v).ndim == 2]
        if not cands:
            raise ValueError(f"unrecognized textual-inversion format: {list(sd)[:5]}")
        emb = cands[0]
    emb = np.asarray(emb, np.float32)
    if emb.ndim == 1:
        emb = emb[None]
    return emb


def register_textual_inversions(
    tokenizer, paths: list[str]
) -> np.ndarray | None:
    """Load TI files, register their placeholder tokens (file stem) on the
    tokenizer, and return the stacked extra-embedding matrix in registration
    order (rows index `vocab_size + i`)."""
    mats = []
    for p in paths:
        p = Path(p)
        if not p.exists():
            continue
        emb = load_textual_inversion(p)
        tokenizer.add_multi_vector_token(p.stem.lower(), emb.shape[0])
        mats.append(emb)
    if not mats:
        return None
    return np.concatenate(mats, axis=0)
