"""Regenerate tests/goldens/ref_numpy_cornell64.npz — the independent
numpy-estimator golden used by tests/test_ref_estimator.py.

Two renders of CornellBox-Original by verify/ref_estimator_numpy.py:
the 512-spp golden (seed 0: mean + per-sample variance, the z-score
denominator) and a 256-spp same-estimator CONTROL probe (seed 7: mean
only) whose z-stats against the golden calibrate the heavy-tailed
Monte-Carlo null that the tracer must match. ~13 min on CPU.

    python -m verify.make_golden [--out tests/goldens/...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SIZE, SPP, SEED = 64, 512, 0
SPP_CTRL, SEED_CTRL = 256, 7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        ROOT, "tests", "goldens", "ref_numpy_cornell64.npz"))
    args = ap.parse_args()

    from tracer_tpu.utils.objloader import load_obj
    from verify.ref_estimator_numpy import render

    obj = os.path.join(os.environ.get("TRACER_ASSETS",
                                      "/root/reference/assets"),
                       "CornellBox-Original.obj")
    tris, tm, mats = load_obj(obj)
    t0 = time.time()
    mean, var, _ = render(SEED, SIZE, SIZE, SPP, tris, tm, mats)
    mean_c, _, _ = render(SEED_CTRL, SIZE, SIZE, SPP_CTRL, tris, tm, mats)
    np.savez_compressed(
        args.out, mean=mean.astype(np.float32), var=var.astype(np.float32),
        spp=SPP, mean_ctrl=mean_c.astype(np.float32), spp_ctrl=SPP_CTRL,
        seed=SEED, seed_ctrl=SEED_CTRL, size=SIZE)
    print(f"wrote {args.out} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
