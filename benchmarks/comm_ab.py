"""Wall-clock A/B of the distributed normal-equation exchange modes.

The collective-volume table (BENCHMARKS.md) derives the O(E)-blocks vs
O(F^2)-dense float counts analytically; this measures the two modes'
actual wall time on the 8-virtual-device CPU mesh (the only multi-device
rig available — VERDICT r2 #6 asked for a measured time next to the
table). CPU-mesh collectives are shared-memory copies, so this bounds
the *compute+copy* cost of each mode, not ICI latency; the volume ratio
is what transfers to real interconnect.

Run: python benchmarks/comm_ab.py [--frames 64] [--points 512]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="*", default=[18, 64])
    ap.add_argument("--points", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # the test fixtures are f64

    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.parallel import mesh as mesh_mod
    from mv_lm_icp_tpu.parallel import sharded
    from tests.test_multiview import synthetic_frameset

    print(f"devices: {len(jax.devices())} "
          f"({jax.devices()[0].platform})")
    print(f"{'F':>4s} {'E':>4s} {'mode':>7s} {'ms/round':>9s}")
    for F in args.frames:
        fs = synthetic_frameset(F=F, N=args.points, sigma=0.02,
                                sigmat=0.01, seed=7)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        mesh = mesh_mod.make_mesh(jax.devices()[:8], shape=(8, 1))
        results = {}
        for comm in ("blocks", "dense"):
            cfg = pipeline.ICPConfig(rounds=1, knn=2, cutoff=1.0,
                                     metric="point_to_plane", robust=True,
                                     nn_chunk=min(256, args.points),
                                     comm=comm)
            fs1, _ = sharded.sharded_icp_round(fs, edges, cfg, mesh)
            jax.block_until_ready(fs1.poses)  # compile
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                fs1, _ = sharded.sharded_icp_round(fs, edges, cfg, mesh)
                jax.block_until_ready(fs1.poses)
                times.append(time.perf_counter() - t0)
            results[comm] = min(times)
            print(f"{F:4d} {edges.shape[0]:4d} {comm:>7s} "
                  f"{min(times)*1e3:9.1f}")
        r = results["dense"] / results["blocks"]
        print(f"{F:4d} blocks is {r:.2f}x dense wall-clock")


if __name__ == "__main__":
    main()
