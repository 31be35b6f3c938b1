"""Profile the GICP pose-graph round: NN vs solve split, chi2 rounds run.

Scratch profiling harness for VERDICT #3 (target <=130 ms/round on the
Bunny 18-frame config). Run: python benchmarks/profile_gicp.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mv_lm_icp_tpu.models import correspond, frameset
    from mv_lm_icp_tpu.solvers import posegraph
    from mv_lm_icp_tpu.utils import datasets, metrics

    raw = datasets.load_raw_frames("/root/reference/samples/Bunny_RealData",
                                   limit=40, step=2, sigma=0.02, sigmat=0.01,
                                   seed=0)
    fs = frameset.from_raw(raw, dtype=jnp.float32)
    edges = frameset.knn_pose_graph(fs.poses, 2)
    print(f"frames={fs.num_frames} pts={fs.num_points} edges={edges.shape[0]}")

    nn_t, solve_t, rounds_hist = [], [], []
    for i in range(8):
        t0 = time.perf_counter()
        corr = correspond.find_correspondences(fs, edges, 0.05,
                                               use_pallas=True)
        jax.block_until_ready(corr.nn_idx)
        t1 = time.perf_counter()
        fs, hist, rounds = posegraph.solve_posegraph_fused(
            fs, edges, corr, point_to_plane=True)
        jax.block_until_ready(fs.poses)
        t2 = time.perf_counter()
        nn_t.append(t1 - t0)
        solve_t.append(t2 - t1)
        rounds_hist.append(int(rounds))
        hist_head = [f"{h:.4g}" for h in list(hist[:int(rounds)])[:8]]
        print(f"round {i}: nn={1e3*(t1-t0):7.1f}ms solve={1e3*(t2-t1):7.1f}ms"
              f" chi2_rounds={int(rounds)} hist={hist_head}")
    print(f"steady: nn={1e3*min(nn_t[1:]):.1f}ms "
          f"solve={1e3*min(solve_t[1:]):.1f}ms")
    print(f"final RMSE={float(metrics.alignment_rmse(fs)):.5f}")


if __name__ == "__main__":
    main()
