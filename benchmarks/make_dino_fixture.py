"""Generate the committed dinosaur oracle-pose fixture.

Runs the independent scipy oracle (benchmarks/oracle_scipy.py — cKDTree +
TRF, f64 CPU, no shared solver code) on the relocalized dinosaur workload
and stores its final poses as pose7 rows in
``tests/data/dino_oracle_poses.npz``, so CI can pin the round-3 accuracy
forensics (our converged energy <= the oracle's; gauge-aligned ranking)
WITHOUT paying the ~2000 s scipy run per test session
(tests/test_dinosaur.py).

One-time:  python benchmarks/make_dino_fixture.py [--rounds 12]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "dino_oracle_poses.npz"))
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from scipy.spatial.transform import Rotation

    from benchmarks import oracle_scipy as oracle
    from mv_lm_icp_tpu.ops import pca
    from mv_lm_icp_tpu.utils import datasets

    raw = datasets.load_raw_frames(datasets.DINOSAUR_DIR, limit=5, step=1,
                                   relocalize_with_gt=True)
    import jax.numpy as jnp

    raw.normals = [np.asarray(pca.recompute_normals(
        jnp.asarray(p), jnp.ones(p.shape[0], bool), k=10)[0])
        for p in raw.points]
    frames, poses, gts = oracle.frames_from_raw(raw)

    t0 = time.perf_counter()
    poses, hist = oracle.run(frames, poses, gts, rounds=args.rounds,
                             cutoff=10.0)
    dt = time.perf_counter() - t0

    pose7 = np.stack([
        np.concatenate([Rotation.from_rotvec(rv).as_quat(), t])
        for rv, t in poses])
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, poses=pose7,
             rmse_history=np.asarray(hist),
             rounds=args.rounds, cutoff=10.0, seconds=dt)
    print(f"wrote {args.out}: final raw RMSE {hist[-1]:.4f} "
          f"({dt:.0f}s, {args.rounds} rounds)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
