"""Solver evaluation matrix on the reference's default multiview workload.

The reference's mission is comparing optimizers and parameterizations
(README.md:11-18: Ceres angle-axis / Eigen quaternion / Sophus SE3, g2o
GICP, two metrics). This runs the same matrix on the TPU framework —
full 18-frame Bunny config (limit=40, step=2, knn=2, cutoff=0.05,
noise 0.02/0.01, 20 rounds) — and reports per-round wall time and final
alignment RMSE per configuration. Results are recorded in BENCHMARKS.md.

Run: python benchmarks/matrix.py [--rounds 20] [--stride 1]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--dir", default="/root/reference/samples/Bunny_RealData")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.utils import datasets, metrics

    raw = datasets.load_raw_frames(args.dir, limit=40, step=2,
                                   sigma=0.02, sigmat=0.01, seed=0)
    fs0 = frameset.from_raw(raw, dtype=jnp.float32,
                            point_stride=args.stride)
    r0 = float(metrics.alignment_rmse(fs0))
    print(f"frames={fs0.num_frames} pts={fs0.num_points} "
          f"rounds={args.rounds} initial RMSE={r0:.5f}")
    print(f"{'config':38s} {'ms/round':>9s} {'final RMSE':>11s}")

    lm_configs = [(p, m)
                  for p in ("se3", "quat", "angle_axis")
                  for m in ("point_to_plane", "point_to_point")]
    for param, metric in lm_configs:
        cfg = pipeline.ICPConfig(rounds=args.rounds, knn=2, cutoff=0.05,
                                 metric=metric, param_name=param,
                                 robust=True, use_pallas=True)

        @jax.jit
        def fused(fs, cfg=cfg):
            return pipeline.run_icp_fused(fs, cfg)

        fs1, _, _ = jax.block_until_ready(fused(fs0))  # compile
        t0 = time.perf_counter()
        fs1, _, _ = jax.block_until_ready(fused(fs0))
        dt = (time.perf_counter() - t0) / args.rounds
        rmse = float(metrics.alignment_rmse(fs1))
        print(f"LM {param:12s} {metric:20s} {dt*1e3:9.1f} {rmse:11.5f}")

    # pose-graph (g2o GICP equivalent) — the WHOLE 20-round alternation
    # (correspondence + chi2-monitored pose-graph solve) fused into one
    # program, measured exactly like the LM rows above
    for p2pl in (True, False):
        metric = "point_to_plane" if p2pl else "point_to_point"
        cfg = pipeline.ICPConfig(rounds=args.rounds, knn=2, cutoff=0.05,
                                 metric=metric, use_pallas=True)
        fs1, _, _ = jax.block_until_ready(
            pipeline.run_gicp_fused(fs0, cfg))  # compile
        t0 = time.perf_counter()
        fs1, _, _ = jax.block_until_ready(pipeline.run_gicp_fused(fs0, cfg))
        dt = (time.perf_counter() - t0) / args.rounds
        rmse = float(metrics.alignment_rmse(fs1))
        print(f"posegraph/GICP {metric:20s}    {dt*1e3:9.1f} {rmse:11.5f}")


if __name__ == "__main__":
    main()
