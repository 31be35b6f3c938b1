"""On-device multiview f64 accuracy probe (run with JAX_ENABLE_X64=1).

The multiview analogue of accuracy_f64.py (VERDICT r4 #6): run the
reference's Bunny multiview workload in f32 (fused on-device alternation),
then polish the converged joint poses with 3 f64 Gauss-Newton steps of the
joint system (api.refine_multiview — lm.refine_pairwise lifted to the
frame graph). Reports alignment RMSE before/after the polish and the f64
joint-cost decrease. The reference solves everything in double
(icp-ceres.cpp is all-double); this is the measured proof that the mixed
f32-solve + f64-polish strategy reaches the same optimum on the ACTUAL
accuracy bar — multiview RMSE on Bunny (BASELINE.md) — not just the
pairwise pose-recovery line.

Prints one JSON line:
  {"backend":..., "frames":..., "points_per_frame":...,
   "rmse_init":..., "rmse_f32":..., "rmse_f64":...,
   "cost_f32_at64":..., "cost_f64":..., "refine_ms":...}

Point stride 4 keeps the f64 compile surface small (accuracy measures a
fixed point, not statistics — same argument as the pairwise probe).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--step", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=12)
    args = ap.parse_args(argv)

    if not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # persist everything: server-side compiles time <1 s client-side
        # and would never pass the default threshold (accuracy_f64.py)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from mv_lm_icp_tpu import api
    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.utils import datasets, metrics

    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    raw = datasets.load_raw_frames(datasets.BUNNY_DIR, limit=args.limit,
                                   step=args.step, sigma=0.02,
                                   sigmat=0.01, seed=0)
    fs = frameset.from_raw(raw, dtype=jnp.float32,
                           point_stride=args.stride)
    cfg = pipeline.ICPConfig(rounds=args.rounds, knn=2, cutoff=0.05,
                             metric="point_to_plane", robust=True)
    edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
    rmse_init = float(metrics.alignment_rmse(fs))

    fs32, costs, _ = jax.block_until_ready(pipeline.run_icp_fused(fs, cfg))
    rmse_f32 = float(metrics.alignment_rmse(fs32))

    t0 = time.perf_counter()
    fs64, hist = api.refine_multiview(fs32, edges, cfg, iters=3)
    jax.block_until_ready(fs64.poses)
    refine_ms = (time.perf_counter() - t0) * 1e3
    rmse_f64 = float(metrics.alignment_rmse(fs64))

    print(json.dumps({
        "backend": jax.devices()[0].platform,
        "frames": int(fs.num_frames),
        "points_per_frame": int(fs.num_points),
        "rmse_init": round(rmse_init, 8),
        "rmse_f32": round(rmse_f32, 8),
        "rmse_f64": round(rmse_f64, 8),
        "cost_f32_at64": float(hist[0]),
        "cost_f64": float(hist[-1]),
        "refine_ms": round(refine_ms, 1),
    }))


if __name__ == "__main__":
    main()
