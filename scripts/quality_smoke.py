"""Bench quality line (VERDICT r4 next #7): one JSON object on stdout.

Two numerics smokes, both environment-independent of the chip (they run on
CPU in a subprocess so the bench's TPU session never pays their compiles):

1. engine-vs-oracle: the default-gate Euler/CFG full-window golden
   (tests/test_engine.py euler_window_golden_pair — engine programs vs an
   independent torch/numpy reimplementation with identical weights and
   noise draws), reported as SSIM / PSNR / max-abs-err instead of a bare
   assert, so a numerics regression shows up in the SAME artifact the
   driver reads for perf.

2. fvd-random smoke: FVD in the random-init I3D feature space
   (scripts/eval_quality.py fallback; relative-comparisons-only — no real
   I3D checkpoint exists in this environment) between two noise videos:
   identical stacks must give ~0, different seeds must give a finite
   positive value. Guards the FVD pipeline itself, not model quality.

Run standalone: `python scripts/quality_smoke.py` — bench.py shells out to
this with JAX_PLATFORMS=cpu and wraps the output into its quality metric
line.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path


def main() -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    root = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root))
    sys.path.insert(0, str(root / "tests"))

    from scripts.eval_quality import fvd, psnr, ssim
    from tests.test_engine import euler_window_golden_pair

    out_j, out_t = euler_window_golden_pair()
    # outputs are (B, F, H, W, 3) in [0, 1]; compare frame-wise as u8 images
    a8 = (np.asarray(out_j)[0] * 255.0 + 0.5).astype(np.uint8)
    b8 = (np.asarray(out_t)[0] * 255.0 + 0.5).astype(np.uint8)
    engine_ssim = float(np.mean([ssim(x, y) for x, y in zip(a8, b8)]))
    # cap PSNR: u8-identical frames give inf, which is not valid JSON
    engine_psnr = float(min(np.mean([psnr(x, y) for x, y in zip(a8, b8)]), 99.0))
    max_abs = float(np.abs(np.asarray(out_j) - np.asarray(out_t)).max())

    # structurally different videos (noise vs moving gradient): random-conv
    # features of two white-noise stacks are statistically near-identical,
    # which would flatten the smoke to 0-vs-0
    rs1 = np.random.RandomState(0)
    vid_a = [(rs1.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(16)]
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    vid_b = [np.stack([(xx * 4 + t * 8) % 256, (yy * 4) % 256,
                       np.full_like(xx, 64)], -1).astype(np.uint8)
             for t in range(16)]
    # width-0.25 random-init net: the smoke checks the FVD pipeline's
    # invariants (identity == 0, distinct content > 0), not model quality —
    # the tiny net keeps this a sub-minute CPU job
    fvd_same = float(fvd(vid_a, vid_a, _width=0.25)["fvd"])
    fvd_diff = float(fvd(vid_a, vid_b, _width=0.25)["fvd"])

    print(json.dumps({
        "engine_vs_torch_oracle": {
            "workload": "Euler/CFG 4-step full window, tiny geometry, identical weights+noise (the default-gate golden)",
            "mean_frame_ssim": round(engine_ssim, 5),
            "mean_frame_psnr_db": round(engine_psnr, 2),
            "max_abs_err": f"{max_abs:.2e}",
            "gate": "tests assert max_abs_err < 2e-3",
        },
        "fvd_random_smoke": {
            "identical_videos": f"{fvd_same:.2e}",
            "distinct_content": f"{fvd_diff:.2e}",
            "note": "random-init I3D feature space (no I3D checkpoint in this environment): relative comparisons only; guards the FVD pipeline, not model quality",
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
