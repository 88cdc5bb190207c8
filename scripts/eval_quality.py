"""Video quality / parity evaluation harness.

The reference publishes no quantitative quality metrics (SURVEY §6) and its
stitching quality can only be judged visually. This tool computes the
metrics the BASELINE calls for when comparing against reference outputs
(SSIM/PSNR per frame + temporal-consistency score), over two videos or two
frame directories:

    python scripts/eval_quality.py <ours> <reference> [--max-frames N]

Prints one JSON line. Pure numpy — usable anywhere the frames are.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float64)


def _filter2(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Valid-mode 2D correlation via stride tricks (no scipy dependency)."""
    K = k.shape[0]
    H, W = img.shape
    s = img.strides
    windows = np.lib.stride_tricks.as_strided(
        img, shape=(H - K + 1, W - K + 1, K, K), strides=(s[0], s[1], s[0], s[1])
    )
    return np.einsum("ijkl,kl->ij", windows, k)


def ssim(a: np.ndarray, b: np.ndarray) -> float:
    """Mean SSIM of two uint8 RGB frames (Wang et al. 2004 constants,
    gaussian 11x11 window, computed per channel on float64)."""
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    k = _gaussian_kernel()
    vals = []
    for c in range(a.shape[-1]):
        x = a[..., c].astype(np.float64)
        y = b[..., c].astype(np.float64)
        mx = _filter2(x, k)
        my = _filter2(y, k)
        mxx = _filter2(x * x, k) - mx * mx
        myy = _filter2(y * y, k) - my * my
        mxy = _filter2(x * y, k) - mx * my
        s = ((2 * mx * my + C1) * (2 * mxy + C2)) / (
            (mx**2 + my**2 + C1) * (mxx + myy + C2)
        )
        vals.append(s.mean())
    return float(np.mean(vals))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def temporal_consistency(frames: list[np.ndarray]) -> float:
    """Mean absolute inter-frame delta (lower = smoother video; the metric
    the overlap-stitching machinery exists to keep low across window
    boundaries)."""
    if len(frames) < 2:
        return 0.0
    deltas = [
        np.mean(np.abs(frames[i + 1].astype(np.float64) - frames[i].astype(np.float64)))
        for i in range(len(frames) - 1)
    ]
    return float(np.mean(deltas))


def load_frames(path: str, max_frames: int | None = None) -> list[np.ndarray]:
    """Frames from a video file (OpenCV) or a directory of numbered images."""
    p = Path(path)
    frames: list[np.ndarray] = []
    if p.is_dir():
        for f in sorted(p.iterdir()):
            if f.suffix.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            from PIL import Image

            frames.append(np.asarray(Image.open(f).convert("RGB"), np.uint8))
            if max_frames and len(frames) >= max_frames:
                break
        return frames
    import cv2

    cap = cv2.VideoCapture(str(p))
    try:
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            frames.append(bgr[..., ::-1].copy())
            if max_frames and len(frames) >= max_frames:
                break
    finally:
        cap.release()
    return frames


def frechet_distance(feat_a: np.ndarray, feat_b: np.ndarray) -> float:
    """Fréchet distance between Gaussian fits of two feature sets
    (N, D): |mu1-mu2|^2 + tr(C1 + C2 - 2 (C1^1/2 C2 C1^1/2)^1/2).

    Host float64; the matrix square roots go through symmetric
    eigendecompositions (no scipy): C1^1/2 = U sqrt(L) U^T, then
    tr sqrt(M) with M = C1^1/2 C2 C1^1/2 symmetric PSD. Negative
    eigenvalues from rank deficiency (few clips) clamp to 0."""
    a = np.asarray(feat_a, np.float64)
    b = np.asarray(feat_b, np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)

    def _cov(m: np.ndarray) -> np.ndarray:
        # np.cov of a single observation is a 0-d nan (ddof=1); treat a
        # one-clip set as a degenerate point-mass Gaussian (zero covariance)
        # so short videos still get the mean-shift term
        if m.shape[0] < 2:
            return np.zeros((m.shape[1], m.shape[1]))
        return np.cov(m, rowvar=False)

    ca = _cov(a)
    cb = _cov(b)
    la, ua = np.linalg.eigh(ca)
    sqrt_ca = (ua * np.sqrt(np.clip(la, 0, None))) @ ua.T
    m = sqrt_ca @ cb @ sqrt_ca
    lm = np.linalg.eigvalsh((m + m.T) / 2)
    tr_sqrt = np.sqrt(np.clip(lm, 0, None)).sum()
    return float(((mu_a - mu_b) ** 2).sum() + np.trace(ca) + np.trace(cb) - 2 * tr_sqrt)


def _i3d_features(frames: list[np.ndarray], extract, clip_len: int) -> np.ndarray:
    """Stack frames into non-overlapping clip_len clips (tail clip padded by
    repeating the last frame, standard FVD practice for short videos),
    resize to 224x224, scale to [-1, 1], run the extractor."""
    import jax
    import jax.numpy as jnp

    n = len(frames)
    if n == 0:
        raise ValueError("no frames for FVD")
    clips = []
    for s in range(0, n, clip_len):
        chunk = frames[s:s + clip_len]
        while len(chunk) < clip_len:
            chunk.append(chunk[-1])
        clips.append(np.stack(chunk))
    x = jnp.asarray(np.stack(clips), jnp.float32) / 127.5 - 1.0
    x = jax.image.resize(x, (*x.shape[:2], 224, 224, 3), "bilinear")
    return np.asarray(extract(x))


def fvd(ours: list[np.ndarray], ref: list[np.ndarray],
        i3d_path: str | None = None, clip_len: int = 16,
        _width: float = 1.0) -> dict:
    """Fréchet Video Distance over I3D Mixed_5c features (BASELINE.md's
    quality metric; VERDICT r3 #5).

    Checkpoint-gated like every weights-dependent component: pass (or set
    CONTROLANIMATE_I3D to) a pytorch-i3d Kinetics-400 state dict
    (`rgb_imagenet.pt` layout) for published-comparable FVD. Without one —
    this environment ships no I3D weights — the DOCUMENTED FALLBACK is the
    same I3D architecture at a fixed random init (PRNGKey(0)): random
    deep-conv features still define a valid Fréchet metric for RELATIVE
    comparisons within one harness run (identical sets -> 0, monotone in
    perturbation strength — pinned by tests), but the absolute number is
    not comparable to published Kinetics-FVD values. The JSON says which
    space was used."""
    import os

    import jax
    import jax.numpy as jnp

    from controlanimate_tpu.models.i3d import I3D, i3d_params_from_torch

    i3d_path = i3d_path or os.environ.get("CONTROLANIMATE_I3D")
    model = I3D(width=_width)  # _width<1: tiny nets for CPU tests only
    if i3d_path and _width != 1.0:
        raise ValueError("checkpoint features require the width-1 model")
    if i3d_path and Path(i3d_path).exists():
        from controlanimate_tpu.weights import ingest as _ingest

        params = i3d_params_from_torch(_ingest.load_state_dict(str(i3d_path)))
        space = "i3d_kinetics400"
    else:
        if i3d_path:
            raise FileNotFoundError(f"I3D checkpoint not found: {i3d_path}")
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, clip_len, 32, 32, 3), jnp.float32)
        )["params"]
        space = "i3d_random_init (no Kinetics checkpoint; relative comparisons only)"

    extract = jax.jit(lambda x: model.apply({"params": params}, x))
    fa = _i3d_features(ours, extract, clip_len)
    fb = _i3d_features(ref, extract, clip_len)
    return {
        # full precision: tiny-width test nets produce O(1e-7) distances
        # that decimal rounding would flatten to 0; Kinetics-scale values
        # are O(10-1000) and unaffected
        "fvd": frechet_distance(fa, fb),
        "fvd_feature_space": space,
        "fvd_clips": [int(fa.shape[0]), int(fb.shape[0])],
        "fvd_clip_len": clip_len,
    }


def evaluate(ours: list[np.ndarray], ref: list[np.ndarray]) -> dict:
    n = min(len(ours), len(ref))
    if n == 0:
        raise ValueError("no overlapping frames to compare")
    ssims = [ssim(ours[i], ref[i]) for i in range(n)]
    psnrs = [psnr(ours[i], ref[i]) for i in range(n)]
    return {
        "frames_compared": n,
        "ssim_mean": round(float(np.mean(ssims)), 5),
        "ssim_min": round(float(np.min(ssims)), 5),
        "psnr_mean": round(float(np.mean(psnrs)), 3),
        "temporal_ours": round(temporal_consistency(ours[:n]), 4),
        "temporal_ref": round(temporal_consistency(ref[:n]), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ours", help="video file or frame directory")
    ap.add_argument("reference", help="video file or frame directory")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--fvd", action="store_true",
                    help="also compute Fréchet Video Distance (I3D features)")
    ap.add_argument("--i3d-dir", default=None,
                    help="pytorch-i3d Kinetics checkpoint (.pt); falls back "
                         "to env CONTROLANIMATE_I3D, then fixed random init")
    a = ap.parse_args()
    ours = load_frames(a.ours, a.max_frames)
    ref = load_frames(a.reference, a.max_frames)
    out = evaluate(ours, ref)
    if a.fvd:
        out.update(fvd(ours, ref, i3d_path=a.i3d_dir))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
