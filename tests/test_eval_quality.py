"""Quality-metric harness correctness (scripts/eval_quality.py)."""

import numpy as np
import pytest

from scripts.eval_quality import evaluate, psnr, ssim, temporal_consistency


def test_ssim_identity_and_ordering():
    rs = np.random.RandomState(0)
    a = rs.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    slightly = np.clip(a.astype(int) + rs.randint(-5, 6, a.shape), 0, 255).astype(np.uint8)
    very = rs.randint(0, 256, a.shape).astype(np.uint8)
    assert ssim(a, slightly) > ssim(a, very)
    # uncorrelated noise: SSIM near zero (the covariance term may dip
    # slightly negative)
    assert -0.2 < ssim(a, very) < 0.3


def test_ssim_matches_known_value_for_constant_shift():
    """Uniform images: structure term vanishes; SSIM reduces to the
    luminance term (2*mu1*mu2 + C1)/(mu1^2 + mu2^2 + C1)."""
    a = np.full((32, 32, 3), 100, np.uint8)
    b = np.full((32, 32, 3), 120, np.uint8)
    C1 = (0.01 * 255) ** 2
    want = (2 * 100 * 120 + C1) / (100**2 + 120**2 + C1)
    assert ssim(a, b) == pytest.approx(want, rel=1e-6)


def test_psnr():
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.full((8, 8, 3), 16, np.uint8)
    assert psnr(a, b) == pytest.approx(10 * np.log10(255**2 / 16**2), rel=1e-6)
    assert psnr(a, a) == float("inf")


def test_temporal_consistency_and_evaluate():
    rs = np.random.RandomState(1)
    base = rs.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    smooth = [base, base, base]
    jumpy = [base, 255 - base, base]
    assert temporal_consistency(smooth) < temporal_consistency(jumpy)
    out = evaluate(smooth, smooth)
    assert out["frames_compared"] == 3
    assert out["ssim_mean"] == pytest.approx(1.0)
