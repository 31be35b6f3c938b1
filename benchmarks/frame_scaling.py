"""Frame-axis scaling of the frame-sharded ring path (VERDICT r4 #5).

The ring path's story is HBM relief — scenes with more frames than one
chip wants resident (parallel/ring.py). This benchmark exercises the
frame axis at F = 32/64/128 slabs of the tiled synthetic scene
(BASELINE 'large synthetic scene sharded across hosts') and records,
per F:

- ms/round of the frame-sharded ring round on the visible device mesh
  (the 8-virtual-device CPU mesh in CI — correctness + relative scaling;
  wall-clock transfers to real ICI only directionally),
- the per-LM-iteration collective volume in both exchange modes
  (parallel/assemble.collective_floats — the quantity that DOES transfer
  to real interconnects),
- halo-exchange volume per round (2H hops x F/n_dev frames x N points
  x 7 f32 planes),
- convergence (alignment RMSE before/after).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/frame_scaling.py --platform cpu --frames 32 64
Single-chip fused-window reference at the same F (no frame sharding):
  python benchmarks/frame_scaling.py --single --frames 32 64
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--replicate", type=int, default=51,
                    help="scene tiling factor PER 8 FRAMES: the tiling "
                         "scales with F so slab thickness (and per-frame "
                         "point count) stays constant — the weak-scaling "
                         "setup where more frames mean more scene, the "
                         "regime the frame-sharded path exists for "
                         "(default 51 matches the BENCHMARKS large-scene "
                         "config: ~61k pts/frame)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--single", action="store_true",
                    help="single-device fused window path instead of the "
                         "frame-sharded ring (real-chip reference)")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.parallel import assemble
    from mv_lm_icp_tpu.utils import datasets, metrics

    devs = jax.devices()
    print(f"devices: {len(devs)} x {devs[0].platform}")

    for F in args.frames:
        # weak scaling: tile the scene proportionally to F so each slab
        # keeps the reference config's geometry (more frames = more
        # scene, constant per-frame load)
        rep = max(1, round(args.replicate * F / 8))
        # rotation noise must stay inside ICP's capture range: sigma_rot
        # displaces slab ENDS by sigma * halfextent, which must be well
        # under the cutoff (BENCHMARKS 'rotation noise must scale down
        # with scene size — a property of the problem, not the solver').
        # 1e-4 rad on these ~28-unit slabs ~ 0.3 * cutoff at the ends.
        raw = datasets.make_scene_frames(
            num_frames=F, overlap=0.5, sigma=1e-4, sigmat=0.002,
            seed=2, replicate=rep)
        fs = frameset.from_raw(raw, dtype=jnp.float32, pad_multiple=2048,
                               recompute_normals=False)
        # anchor BOTH chain ends: the line-tiled fixture has no loop
        # closure, so a single gauge anchor lets boundary-bias drift
        # accumulate along the F-long chain (odometry drift — a property
        # of the fixture's topology, observed on every backend incl.
        # single-device). Two anchors bound it and keep the scaling
        # study about wall-clock + collectives, not chain statistics.
        import numpy as _np

        fixed = _np.zeros(fs.num_frames, bool)
        fixed[0] = fixed[-1] = True
        fs = fs.replace(fixed=jnp.asarray(fixed))
        N = fs.num_points
        total = int(np.sum(np.asarray(fs.valid)))
        edges = frameset.knn_pose_graph(fs.poses, 2)
        need = int(pipeline.window_need(fs, edges, 0.01))
        W = -(-(need + 2048) // 2048) * 2048
        # prune=True: splitting a fixed scene into MORE slabs makes each
        # slab thinner and the pairwise overlaps smaller — the exact
        # low-overlap regime where nearest-within-cutoff matching biases
        # the energy optimum and the alternation drifts away from GT
        # (BENCHMARKS.md 'low-overlap drift'; measured here too:
        # F=32 thin slabs drift 0.0032 -> 0.014-0.021 WITHOUT prune on
        # single-device brute AND windowed backends alike). The
        # reference's commented-out 1.5*median rejection
        # (frame.cpp:178-183) keeps the scaling study well-posed.
        # Pallas kernels only compile on TPU; the CPU mesh runs the XLA
        # window path (interpret-mode Pallas at 60k pts/frame is not a
        # measurement)
        use_pallas = devs[0].platform == "tpu"
        cfg = pipeline.ICPConfig(rounds=args.rounds, knn=2, cutoff=0.01,
                                 metric="point_to_plane", robust=True,
                                 use_window=True, window=W,
                                 use_pallas=use_pallas, prune=True)
        rmse0 = float(metrics.alignment_rmse(fs))
        E = edges.shape[0]

        if args.single:
            fs1, costs, unc = jax.block_until_ready(
                pipeline.run_icp_fused(fs, cfg))
            t0 = time.perf_counter()
            fs1, costs, unc = jax.block_until_ready(
                pipeline.run_icp_fused(fs, cfg))
            dt = (time.perf_counter() - t0) / args.rounds
            assert int(np.asarray(unc).sum()) == 0, "coverage lost"
            rmse1 = float(metrics.alignment_rmse(fs1))
            print(f"F={F:4d} N/frame={N} ({total/1e6:.2f}M valid) W={W} "
                  f"single fused-window: {dt*1e3:.1f} ms/round  "
                  f"RMSE {rmse0:.5f} -> {rmse1:.5f}")
            continue

        from jax.sharding import Mesh

        from mv_lm_icp_tpu.parallel import ring

        n_dev = len(devs)
        assert F % n_dev == 0, (F, n_dev)
        rmesh = Mesh(np.asarray(devs), (ring.AXIS,))
        fs1, unc = jax.block_until_ready(
            ring.ring_icp_round(fs, cfg, rmesh, edges=edges))
        t0 = time.perf_counter()
        fs_run = fs
        for _ in range(args.rounds):
            fs_run, unc = ring.ring_icp_round(fs_run, cfg, rmesh,
                                              edges=edges)
        jax.block_until_ready(fs_run.poses)
        dt = (time.perf_counter() - t0) / args.rounds
        assert int(unc) == 0, "window coverage lost"
        rmse1 = float(metrics.alignment_rmse(fs_run))
        # analytic comm volumes (floats)
        blocks = assemble.collective_floats(F, E, "blocks")
        dense = assemble.collective_floats(F, E, "dense")
        halo = 2 * 1 * (F // n_dev) * N * 7   # H=1, 7 f32 planes/frame
        print(f"F={F:4d} N/frame={N} ({total/1e6:.2f}M valid) W={W} "
              f"ring x{n_dev}: {dt*1e3:.1f} ms/round  "
              f"RMSE {rmse0:.5f} -> {rmse1:.5f}  "
              f"comm/LM-iter blocks={blocks*4/1024:.0f}kB "
              f"dense={dense*4/1024:.0f}kB halo/round={halo*4/1e6:.1f}MB")


if __name__ == "__main__":
    main()
