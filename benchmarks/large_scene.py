"""Large-synthetic-scene benchmark (BASELINE configs[4]): scene.xyz tiled
along its longest axis, cut into 8 overlapping slab frames, solved with
the sorted-window correspondence backend — single-device fused or sharded
over all visible devices (shard_map, edge x point mesh).

This is the configuration that motivates multi-chip: at --replicate 51
each frame holds ~61k points (0.49M total), at 203 ~244k (1.95M total) —
the scale where the reference's per-point KD-tree queries
(src/internal/frame.cpp:187-206) stop being tractable on one core.

Run (single chip, fused loop):
    python benchmarks/large_scene.py --replicate 51 --rounds 6 --pallas
Run (sharded over devices, host-driven rounds):
    python benchmarks/large_scene.py --replicate 51 --rounds 6 --pallas \
        --sharded
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=51,
                    help="51 -> ~61k pts/frame; 203 -> ~244k")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--window", type=int, default=None,
                    help="W rows per query tile (default: auto-sized)")
    ap.add_argument("--pallas", action="store_true",
                    help="scalar-prefetch Pallas window kernel")
    ap.add_argument("--sharded", action="store_true",
                    help="shard_map over all visible devices")
    ap.add_argument("--ring", action="store_true",
                    help="frame-sharded ring-halo path (parallel/ring): "
                         "each device owns F/n_dev cloud shards, halo "
                         "frames move via ppermute — the HBM-limited "
                         "regime")
    ap.add_argument("--sigma", type=float, default=0.0005)
    ap.add_argument("--sigmat", type=float, default=0.002)
    ap.add_argument("--normals", action="store_true",
                    help="measure PCA-normal preprocessing (k=10 "
                         "neighbourhoods, frame.cpp:244-255) across all "
                         "frames: XLA sorted-window knn vs the Pallas "
                         "k-NN window kernel")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.utils import datasets, metrics

    print(f"devices: {jax.devices()}")
    raw = datasets.make_scene_frames(num_frames=args.frames,
                                     overlap=0.5, sigma=args.sigma,
                                     sigmat=args.sigmat, seed=2,
                                     replicate=args.replicate)
    fs = frameset.from_raw(raw, dtype=jnp.float32, pad_multiple=2048,
                           recompute_normals=False)
    total = int(np.sum(np.asarray(fs.valid)))
    print(f"frames: {fs.num_frames} x {fs.num_points} padded "
          f"({total/1e6:.2f}M valid points)")

    if args.normals:
        return bench_normals(fs)

    window = args.window
    if window is None:
        # auto-size from the data at the initial poses (+ td margin),
        # one vmapped program over all edges (pipeline.window_need)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        need = int(pipeline.window_need(fs, edges, 0.01))
        window = -(-(need + 2048) // 2048) * 2048
        print(f"auto window W = {window}")

    cfg = pipeline.ICPConfig(rounds=args.rounds, knn=2, cutoff=0.01,
                             metric="point_to_plane", robust=True,
                             use_window=True, window=window,
                             use_pallas=args.pallas)
    rmse0 = float(metrics.alignment_rmse(fs))

    if args.ring:
        from jax.sharding import Mesh

        from mv_lm_icp_tpu.parallel import ring

        devs = np.asarray(jax.devices())
        assert fs.num_frames % len(devs) == 0, (fs.num_frames, len(devs))
        rmesh = Mesh(devs, (ring.AXIS,))
        print(f"ring mesh: {len(devs)} device(s), "
              f"{fs.num_frames // len(devs)} frames/device")
        fs1, unc = jax.block_until_ready(
            ring.ring_icp_round(fs, cfg, rmesh))  # compile
        t0 = time.perf_counter()
        fs_run = fs
        for _ in range(args.rounds):
            fs_run, unc = ring.ring_icp_round(fs_run, cfg, rmesh)
        jax.block_until_ready(fs_run.poses)
        dt = (time.perf_counter() - t0) / args.rounds
        fs = fs_run
        print(f"uncovered (last round): {int(unc)}")
        label = "ring window" + (" pallas" if args.pallas else " xla")
    elif args.sharded:
        from mv_lm_icp_tpu.parallel import mesh as mesh_mod
        from mv_lm_icp_tpu.parallel import sharded

        m = mesh_mod.make_mesh()
        print(f"mesh: {dict(zip(m.axis_names, m.devices.shape))}")
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        # compile once
        fs1, unc = jax.block_until_ready(
            sharded.sharded_icp_round(fs, edges, cfg, m))
        t0 = time.perf_counter()
        fs_run = fs
        for _ in range(args.rounds):
            fs_run, unc = sharded.sharded_icp_round(fs_run, edges, cfg, m)
        jax.block_until_ready(fs_run.poses)
        dt = (time.perf_counter() - t0) / args.rounds
        fs = fs_run
        print(f"uncovered (last round): {int(unc)}")
        label = "sharded window" + (" pallas" if args.pallas else " xla")
    else:
        fs1, costs, unc = jax.block_until_ready(
            pipeline.run_icp_fused(fs, cfg))
        t0 = time.perf_counter()
        fs, costs, unc = jax.block_until_ready(
            pipeline.run_icp_fused(fs, cfg))
        dt = (time.perf_counter() - t0) / args.rounds
        print(f"uncovered per round: {np.asarray(unc).tolist()}")
        label = "fused window" + (" pallas" if args.pallas else " xla")

    rmse1 = float(metrics.alignment_rmse(fs))
    print(f"{label}: {dt*1e3:.1f} ms/round  "
          f"RMSE {rmse0:.5f} -> {rmse1:.5f}")


def bench_normals(fs):
    """PCA-normal preprocessing at scale: per-frame k=10 neighbourhood
    search + SoA Cardano eigh, XLA window backend vs the Pallas k-NN
    window kernel (kernels/nn_window_pallas.knn_window_batch)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mv_lm_icp_tpu.ops import pca

    F, N = fs.num_frames, fs.num_points

    def run_all(use_pallas):
        outs = []
        for f in range(F):
            n, _ = pca.recompute_normals(fs.points[f], fs.valid[f], k=10,
                                         window=8192,
                                         use_pallas=use_pallas)
            outs.append(n)
        return jax.block_until_ready(jnp.stack(outs))

    for tag, flag in [("xla top_k window", False),
                      ("pallas knn window", True)]:
        out = run_all(flag)                      # compile
        t0 = time.perf_counter()
        out = run_all(flag)
        dt = time.perf_counter() - t0
        print(f"normals [{tag}]: {dt*1e3:.1f} ms for {F} x {N} "
              f"({dt/F*1e3:.1f} ms/frame)")
        if flag:
            dots = jnp.abs(jnp.sum(out * ref_out, axis=-1))
            m = np.asarray(fs.valid)
            # agreement over VALID points only: padded rows must not
            # inflate the percentage (they trivially "agree")
            agree = float(jnp.sum(jnp.where(fs.valid, dots > 0.999, False))
                          / jnp.sum(fs.valid))
            print(f"  agreement with XLA path: {agree*100:.2f}% of "
                  f"{int(m.sum())} valid points (|cos| > 0.999)")
        else:
            ref_out = out


if __name__ == "__main__":
    main()
