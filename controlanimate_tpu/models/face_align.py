"""Landmark-aligned face crop/paste geometry for GFPGAN restoration.

The reference's face enhancer (reference: modules/upscaler.py:53-74,
GFPGANer.enhance(..., has_aligned=False, paste_back=True)) does NOT restore
raw boxes: facexlib's FaceRestoreHelper detects 5-point landmarks
(RetinaFace), estimates a similarity transform onto the FFHQ 5-point
template at 512x512, warps the crop, restores it, and pastes back through
the scaled inverse affine under an eroded+blurred soft mask. GFPGAN is
trained on FFHQ-aligned faces, so this alignment is load-bearing for
restoration quality.

This module is the pure geometry half (no weights needed): template,
similarity estimation, warp, inverse-affine soft-mask paste. All functions
are host-side numpy/cv2 — per-face affine warps of a handful of 512^2 crops
are not a TPU-shaped workload; the neural nets around them (detector,
GFPGAN, RealESRGAN background) run jitted on device.
"""

from __future__ import annotations

import numpy as np

# FFHQ 5-point template (left eye, right eye, nose, left mouth, right
# mouth) for a 512x512 aligned crop — the constant facexlib's
# FaceRestoreHelper uses for GFPGAN ('ffhq512' template).
FFHQ_TEMPLATE_512 = np.array(
    [
        [192.98138, 239.94708],
        [318.90277, 240.1936],
        [256.63416, 314.01935],
        [201.26117, 371.41043],
        [313.08905, 371.15118],
    ],
    dtype=np.float32,
)

# warpAffine border fill for out-of-frame crop regions (facexlib uses this
# gray so GFPGAN sees a neutral border rather than black)
BORDER_VALUE = (135, 133, 132)


def estimate_similarity(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity transform (rotation+scale+translation)
    mapping src points onto dst points; returns a 2x3 affine matrix.

    Umeyama closed form — equivalent to the reference's
    cv2.estimateAffinePartial2D(..., LMEDS) on clean 5-point input (LMEDS
    reduces to least squares when a majority consensus fits, which 5
    template landmarks always do)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    if src.shape != dst.shape or src.ndim != 2 or src.shape[1] != 2:
        raise ValueError(f"expected matching (N,2) point sets, got {src.shape} vs {dst.shape}")
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, d])
    R = U @ D @ Vt
    var_s = (sc**2).sum() / src.shape[0]
    scale = (S * np.diag(D)).sum() / var_s
    t = mu_d - scale * R @ mu_s
    M = np.empty((2, 3), np.float64)
    M[:, :2] = scale * R
    M[:, 2] = t
    return M.astype(np.float32)


def invert_affine(M: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine (cv2.invertAffineTransform equivalent)."""
    A = np.asarray(M, np.float64)
    R = A[:, :2]
    Rinv = np.linalg.inv(R)
    out = np.empty((2, 3), np.float64)
    out[:, :2] = Rinv
    out[:, 2] = -Rinv @ A[:, 2]
    return out.astype(np.float32)


def align_face(
    frame: np.ndarray, landmarks5: np.ndarray, face_size: int = 512
) -> tuple[np.ndarray, np.ndarray]:
    """Warp `frame` so `landmarks5` land on the FFHQ template.

    Returns (crop (face_size, face_size, 3) uint8, affine 2x3) — the affine
    maps frame coords -> crop coords (facexlib align_warp_face)."""
    import cv2

    template = FFHQ_TEMPLATE_512 * (face_size / 512.0)
    M = estimate_similarity(np.asarray(landmarks5, np.float32), template)
    crop = cv2.warpAffine(
        frame, M, (face_size, face_size), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=BORDER_VALUE,
    )
    return crop, M


def paste_face(
    background: np.ndarray,
    restored_face: np.ndarray,
    affine: np.ndarray,
    upscale_factor: float = 1.0,
) -> np.ndarray:
    """Paste a restored aligned crop back into `background` (already at
    upscale_factor x the detection frame's resolution) through the scaled
    inverse affine under facexlib's eroded + Gaussian-blurred soft mask
    (FaceRestoreHelper.paste_faces_to_input_image). Returns float32.

    The mask radii follow the reference exactly: erosion 2*upscale px, then
    a center erosion and blur of sqrt(face_area)/20 * 2 px."""
    import cv2

    bg = np.asarray(background, np.float32)
    h_up, w_up = bg.shape[:2]
    face_size = restored_face.shape[0]

    inv = invert_affine(np.asarray(affine, np.float32)) * upscale_factor
    if upscale_factor > 1:
        # the reference adds half-pixel compensation so the upscaled paste
        # lands on pixel centers
        inv = inv.copy()
        inv[:, 2] += 0.5 * upscale_factor

    inv_restored = cv2.warpAffine(
        np.asarray(restored_face, np.float32), inv, (w_up, h_up)
    )
    mask = np.ones((face_size, face_size), np.float32)
    inv_mask = cv2.warpAffine(mask, inv, (w_up, h_up))
    er = max(int(2 * upscale_factor), 1)
    inv_mask_erosion = cv2.erode(inv_mask, np.ones((er, er), np.uint8))
    pasted_face = inv_mask_erosion[:, :, None] * inv_restored
    total_face_area = float(np.sum(inv_mask_erosion))
    if total_face_area <= 0:
        return bg
    w_edge = int(total_face_area**0.5) // 20
    erosion_radius = max(w_edge * 2, 1)
    inv_mask_center = cv2.erode(
        inv_mask_erosion, np.ones((erosion_radius, erosion_radius), np.uint8)
    )
    blur_size = w_edge * 2
    inv_soft_mask = cv2.GaussianBlur(
        inv_mask_center, (blur_size + 1, blur_size + 1), 0
    )[:, :, None]
    return inv_soft_mask * pasted_face + (1 - inv_soft_mask) * bg


def landmarks_from_box(box: tuple[float, float, float, float]) -> np.ndarray:
    """Synthesize 5 landmarks from a frontal face box (x, y, w, h).

    Fallback when no RetinaFace weights exist (e.g. the Haar cascade
    detector only yields boxes): places eyes/nose/mouth at canonical
    frontal-face fractions of the box so the crop still goes through the
    same FFHQ alignment path. Approximate by construction — demoted-quality
    fallback, not reference parity."""
    x, y, w, h = (float(v) for v in box)
    rel = np.array(
        [
            [0.30, 0.40],
            [0.70, 0.40],
            [0.50, 0.62],
            [0.36, 0.78],
            [0.64, 0.78],
        ],
        dtype=np.float32,
    )
    return np.stack([x + rel[:, 0] * w, y + rel[:, 1] * h], axis=1)
