"""Pure-geometry goldens for the GFPGAN face alignment path
(models/face_align.py) vs OpenCV's own transforms — the math the reference
delegates to facexlib's FaceRestoreHelper (reference: modules/upscaler.py:
53-74, GFPGANer enhance -> align_warp_face / paste_faces_to_input_image)."""

import numpy as np
import pytest

from controlanimate_tpu.models import face_align as fa

cv2 = pytest.importorskip("cv2")


def _random_similarity(rs, scale_range=(0.5, 2.0)):
    s = rs.uniform(*scale_range)
    th = rs.uniform(-np.pi, np.pi)
    t = rs.uniform(-50, 50, 2)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    M = np.empty((2, 3))
    M[:, :2] = s * R
    M[:, 2] = t
    return M.astype(np.float32)


def _apply(M, pts):
    return pts @ M[:, :2].T + M[:, 2]


def test_estimate_similarity_recovers_exact_transform():
    rs = np.random.RandomState(0)
    for _ in range(20):
        M = _random_similarity(rs)
        src = rs.uniform(0, 512, (5, 2)).astype(np.float32)
        dst = _apply(M, src)
        got = fa.estimate_similarity(src, dst)
        assert np.allclose(got, M, atol=1e-4), (got, M)


def test_estimate_similarity_matches_cv2_lmeds():
    """cv2.estimateAffinePartial2D(..., LMEDS) is what facexlib calls; on
    noisy (non-degenerate) 5-point input both should agree closely."""
    rs = np.random.RandomState(1)
    for _ in range(10):
        M = _random_similarity(rs)
        src = (fa.FFHQ_TEMPLATE_512 + rs.normal(0, 8, (5, 2))).astype(np.float32)
        dst = _apply(M, src) + rs.normal(0, 0.5, (5, 2)).astype(np.float32)
        ours = fa.estimate_similarity(src, dst)
        theirs, _ = cv2.estimateAffinePartial2D(src, dst, method=cv2.LMEDS)
        # compare action on the source points, not raw matrix entries
        assert np.allclose(_apply(ours, src), _apply(theirs.astype(np.float32), src),
                           atol=1.5), (ours, theirs)


def test_invert_affine_matches_cv2():
    rs = np.random.RandomState(2)
    for _ in range(10):
        M = _random_similarity(rs)
        ours = fa.invert_affine(M)
        theirs = cv2.invertAffineTransform(M)
        assert np.allclose(ours, theirs, atol=1e-5)
        # inverse really inverts
        pts = rs.uniform(0, 100, (7, 2))
        assert np.allclose(_apply(ours, _apply(M, pts)), pts, atol=1e-3)


def test_align_face_puts_landmarks_on_template():
    """Build a frame whose 5 landmarks are a similarity-transformed FFHQ
    template; align_face must map them (and any marked pixel) onto the
    template positions."""
    rs = np.random.RandomState(3)
    frame = np.zeros((400, 600, 3), np.uint8)
    # shrink+shift chosen so template (0,0) maps OUTSIDE the frame (tests
    # the gray border fill) while all landmarks stay inside
    M_true = np.array([[0.5, 0.0, -20.0], [0.0, 0.5, -20.0]], np.float32)
    lm = _apply(M_true, fa.FFHQ_TEMPLATE_512).astype(np.float32)
    # paint a dot at the nose landmark
    nx, ny = int(round(lm[2, 0])), int(round(lm[2, 1]))
    frame[ny - 2:ny + 3, nx - 2:nx + 3] = 255
    crop, A = fa.align_face(frame, lm, face_size=512)
    assert crop.shape == (512, 512, 3)
    # the affine maps the frame landmarks onto the template
    assert np.allclose(_apply(A, lm), fa.FFHQ_TEMPLATE_512, atol=0.5)
    # the painted nose dot appears at the template nose position
    tx, ty = fa.FFHQ_TEMPLATE_512[2]
    patch = crop[int(ty) - 4:int(ty) + 5, int(tx) - 4:int(tx) + 5]
    assert patch.max() == 255
    # out-of-frame border filled with the facexlib gray
    assert tuple(crop[0, 0]) == fa.BORDER_VALUE


def test_align_face_scales_template_with_face_size():
    rs = np.random.RandomState(4)
    frame = (rs.rand(256, 256, 3) * 255).astype(np.uint8)
    lm = _apply(np.array([[0.3, 0, 30], [0, 0.3, 30]], np.float32),
                fa.FFHQ_TEMPLATE_512)
    crop, A = fa.align_face(frame, lm, face_size=128)
    assert crop.shape == (128, 128, 3)
    assert np.allclose(_apply(A, lm), fa.FFHQ_TEMPLATE_512 / 4.0, atol=0.5)


def test_paste_identity_roundtrip():
    """Restoring a crop unchanged and pasting it back must reproduce the
    original frame inside the mask interior (and exactly preserve it far
    outside the face)."""
    # smooth content: two bilinear resamples round-trip almost exactly on
    # low-frequency images (white noise would not — that's resampling, not a
    # paste bug)
    yy, xx = np.mgrid[0:300, 0:300].astype(np.float32)
    frame = np.stack([xx * 0.8, yy * 0.8, (xx + yy) * 0.4], -1).astype(np.uint8)
    lm = _apply(np.array([[0.35, 0, 60], [0, 0.35, 60]], np.float32),
                fa.FFHQ_TEMPLATE_512)
    crop, A = fa.align_face(frame, lm, face_size=512)
    out = fa.paste_face(frame.astype(np.float32), crop.astype(np.float32), A, 1.0)
    assert out.shape == frame.shape
    err = np.abs(out - frame.astype(np.float32))
    # interior of the face region: warp+unwarp is two bilinear resamples —
    # allow small interpolation error
    cy, cx = int(lm[2, 1]), int(lm[2, 0])
    assert err[cy - 10:cy + 10, cx - 10:cx + 10].mean() < 6.0
    # corners (far outside the soft mask) must be untouched
    assert err[:8, :8].max() == 0 and err[-8:, -8:].max() == 0


def test_paste_face_upscale_factor():
    """With upscale_factor=4 the paste lands in the 4x background at 4x the
    original landmark position (the scaled-inverse-affine path the product
    uses with RealESRGAN backgrounds)."""
    rs = np.random.RandomState(6)
    frame = np.zeros((128, 128, 3), np.uint8)
    lm = _apply(np.array([[0.2, 0, 14], [0, 0.2, 14]], np.float32),
                fa.FFHQ_TEMPLATE_512)
    crop, A = fa.align_face(frame, lm, face_size=512)
    bg = np.zeros((512, 512, 3), np.float32)
    restored = np.full((512, 512, 3), 200.0, np.float32)
    out = fa.paste_face(bg, restored, A, upscale_factor=4.0)
    assert out.shape == bg.shape
    # center of the face (nose), scaled by 4, should carry the restored value
    nx, ny = (lm[2] * 4.0).astype(int)
    assert out[ny, nx].mean() > 150.0
    # far corner untouched
    assert out[:4, :4].max() == 0.0


def test_paste_degenerate_mask_returns_background():
    """A face warped fully outside the background leaves it unchanged."""
    bg = np.full((64, 64, 3), 7.0, np.float32)
    A = np.array([[1.0, 0.0, -10000.0], [0.0, 1.0, -10000.0]], np.float32)
    out = fa.paste_face(bg, np.full((512, 512, 3), 255.0, np.float32), A, 1.0)
    assert np.array_equal(out, bg)


def test_landmarks_from_box_layout():
    lm = fa.landmarks_from_box((10, 20, 100, 120))
    assert lm.shape == (5, 2)
    assert (lm[:, 0] >= 10).all() and (lm[:, 0] <= 110).all()
    assert (lm[:, 1] >= 20).all() and (lm[:, 1] <= 140).all()
    # eyes above nose above mouth; left eye left of right eye
    assert lm[0, 1] == lm[1, 1] < lm[2, 1] < lm[3, 1]
    assert lm[0, 0] < lm[1, 0]
    # the synthesized landmarks are similar in SHAPE to the FFHQ template:
    # aligning them must produce a well-conditioned similarity (scale > 0)
    M = fa.estimate_similarity(lm, fa.FFHQ_TEMPLATE_512)
    scale = np.sqrt(np.linalg.det(M[:, :2]))
    assert np.isfinite(scale) and scale > 0
