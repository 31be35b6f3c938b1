"""Dinosaur accuracy experiments (round-3: close the oracle gap).

The round-2 verdict: on the dinosaur workload (5 relocalized frames,
cutoff=10, 12 rounds) the framework plateaued at RMSE 3.49 while the
independent scipy oracle (cKDTree + TRF soft_l1 on residuals/weight,
benchmarks/oracle_scipy.py) reached 2.86. Hypotheses tested here:

- "norm":   scale-NORMALIZED robust loss (the TRF formulation the oracle
            uses — residual/weight with unit soft_l1 — vs the reference's
            Ceres SoftLOneLoss(weight); see ops/robust.soft_l1_norm),
- "prune":  median outlier rejection,
- "tight":  deeper per-round LM (the oracle runs TRF with max_nfev=400,
            xtol 1e-12 — far past Ceres' 50-iteration defaults),
- combinations.

Usage: python benchmarks/dino_experiments.py --variant norm
Prints one JSON line with the per-round RMSE history.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base")
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.solvers import lm as lm_mod
    from mv_lm_icp_tpu.utils import datasets, metrics

    raw = datasets.load_raw_frames(datasets.DINOSAUR_DIR, limit=5, step=1,
                                   relocalize_with_gt=True)
    fs = frameset.from_raw(raw, dtype=jnp.float32,
                           point_stride=args.stride,
                           recompute_normals=True)

    tight = lm_mod.LMConfig(max_iterations=200, function_tolerance=1e-9,
                            parameter_tolerance=1e-10)
    variants = {
        "base": {},
        "norm": dict(loss="soft_l1_norm"),
        "prune": dict(prune=True),
        "norm_prune": dict(loss="soft_l1_norm", prune=True),
        "tight": dict(lm=tight),
        "norm_tight": dict(loss="soft_l1_norm", lm=tight),
        # fixed-src (gauge-anchoring) edges — the oracle keeps these, the
        # reference drops them (frame.cpp:93): the round-2 gap mechanism
        "anchor": dict(fixed_src_edges=True),
        "anchor_norm": dict(fixed_src_edges=True, loss="soft_l1_norm"),
        "anchor_prune": dict(fixed_src_edges=True, prune=True),
        "anchor_norm_prune": dict(fixed_src_edges=True,
                                  loss="soft_l1_norm", prune=True),
        # partial inner solves: cap LM iterations per round. The oracle's
        # TRF stops early (max_nfev=400 INCLUDING finite-difference
        # evals); fully converging each inner solve overfits the stale
        # correspondences and locks the alternation into the 3.45-3.49
        # fixed point (measured: our fully-converged solution has LOWER
        # energy than the oracle's but WORSE RMSE) — partial solves keep
        # the correspondences fresh.
        "partial2": dict(fixed_src_edges=True,
                         lm=lm_mod.LMConfig(max_iterations=2)),
        "partial4": dict(fixed_src_edges=True,
                         lm=lm_mod.LMConfig(max_iterations=4)),
        "partial8": dict(fixed_src_edges=True,
                         lm=lm_mod.LMConfig(max_iterations=8)),
        "partial4_noanchor": dict(lm=lm_mod.LMConfig(max_iterations=4)),
        "partial4_prune": dict(fixed_src_edges=True, prune=True,
                               lm=lm_mod.LMConfig(max_iterations=4)),
        # conservative trust region: scipy TRF starts at radius ~1 and
        # takes bounded steps; Ceres' initial_radius=1e4 means our first
        # LM step is an (almost) undamped Gauss-Newton leap, which on
        # 14%-overlap stale correspondences overshoots the good basin.
        "radius1": dict(fixed_src_edges=True,
                        lm=lm_mod.LMConfig(initial_radius=1.0)),
        "radius01": dict(fixed_src_edges=True,
                         lm=lm_mod.LMConfig(initial_radius=0.1)),
        "radius1_norm": dict(fixed_src_edges=True, loss="soft_l1_norm",
                             lm=lm_mod.LMConfig(initial_radius=1.0)),
        "radius1_prune": dict(fixed_src_edges=True, prune=True,
                              lm=lm_mod.LMConfig(initial_radius=1.0)),
    }
    kw = dict(rounds=args.rounds, knn=2, cutoff=10.0,
              metric="point_to_plane", robust=True)
    kw.update(variants[args.variant])
    cfg = pipeline.ICPConfig(**kw)

    hist = [metrics.alignment_rmse(fs)]
    t0 = time.perf_counter()

    def cb(i, fs_now, corr, stats):
        hist.append(metrics.alignment_rmse(fs_now))
        print(f"  {args.variant} round {i}: rmse {hist[-1]:.4f} "
              f"(lm {int(stats.iterations)} it)", file=sys.stderr,
              flush=True)

    fs2, _ = pipeline.run_icp(fs, cfg, callback=cb)
    print(json.dumps({
        "variant": args.variant, "rounds": args.rounds,
        "stride": args.stride,
        "rmse_history": [round(h, 4) for h in hist],
        "final": round(hist[-1], 4),
        # the gauge-free registration metric (metrics.gauge_aligned_rmse):
        # raw RMSE conflates registration with the noisy anchor pose
        "final_gauge_aligned": round(metrics.gauge_aligned_rmse(fs2), 4),
        "init_gauge_aligned": round(metrics.gauge_aligned_rmse(fs), 4),
        "seconds": round(time.perf_counter() - t0, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
