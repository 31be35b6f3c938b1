"""Multiview LM-ICP CLI.

Replicates src/main_multiview.cpp: load a frame directory, build the kNN
pose graph (adjacency printed), then run the outer ICP loop — 20 rounds of
correspondence search + global solve — with per-round timing. Flags mirror
the reference's 15 multiview gflags 1:1 (main_multiview.cpp:30-51); extras
cover the TPU framework surface (dtype, point stride, sharding, export,
checkpointing — the headless replacements for the interactive viewer).

Run:  python -m mv_lm_icp_tpu.cli.multiview --dir <samples/Bunny_RealData>
"""
from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    # the reference's 15 flags (main_multiview.cpp:30-51)
    p.add_argument("--pointToPlane", dest="point_to_plane",
                   action="store_true", default=True,
                   help="use point to plane distance metric (default true)")
    p.add_argument("--no-pointToPlane", dest="point_to_plane",
                   action="store_false")
    p.add_argument("--sophusSE3", action="store_true", default=True,
                   help="SE3 Lie-algebra parameterization (default)")
    p.add_argument("--no-sophusSE3", dest="sophusSE3", action="store_false")
    p.add_argument("--sophusSE3_autodiff", action="store_true")
    p.add_argument("--angleAxis", action="store_true")
    p.add_argument("--g2o", action="store_true",
                   help="GICP pose-graph solver instead of LM")
    p.add_argument("--cutoff", type=float, default=0.05,
                   help="dmax correspondence pruning distance")
    p.add_argument("--knn", type=int, default=2,
                   help="pose-graph nearest neighbours")
    p.add_argument("--dir", default="/root/reference/samples/Bunny_RealData")
    p.add_argument("--sigma", type=float, default=0.02,
                   help="rotation noise")
    p.add_argument("--sigmat", type=float, default=0.01,
                   help="translation noise")
    p.add_argument("--fake", action="store_true",
                   help="load frame 0 repeatedly")
    p.add_argument("--limit", type=int, default=40)
    p.add_argument("--step", type=int, default=2)
    p.add_argument("--relocalize-gt", dest="relocalize_gt",
                   action="store_true",
                   help="re-express each cloud in its own camera frame "
                        "via the groundtruth file (dinosaur-style "
                        "datasets whose shipped clouds are ALREADY "
                        "registered — applying the pose files to them "
                        "scatters the scene; see "
                        "utils/datasets.load_raw_frames)")
    p.add_argument("--recomputeNormals", dest="recompute_normals",
                   action="store_true", default=True)
    p.add_argument("--no-recomputeNormals", dest="recompute_normals",
                   action="store_false")
    p.add_argument("--robust", action="store_true", default=True)
    p.add_argument("--no-robust", dest="robust", action="store_false")
    p.add_argument("--prune", action="store_true",
                   help="reject matches with dist > 1.5*median (the "
                        "reference's commented-out outlier rejection, "
                        "frame.cpp:178-183; stabilizes low-overlap "
                        "scenes)")
    p.add_argument("--anchor-edges", dest="anchor_edges",
                   action="store_true",
                   help="keep correspondences whose SOURCE frame is "
                        "gauge-fixed (the reference drops them, "
                        "frame.cpp:93, losing the anchoring through "
                        "frame 0's viewpoint; improves low-overlap "
                        "registration — see models/correspond.py)")
    p.add_argument("--loss", choices=["soft_l1", "soft_l1_norm"],
                   default="soft_l1",
                   help="robust loss family when --robust: soft_l1 = "
                        "Ceres SoftLOneLoss semantics (reference "
                        "default); soft_l1_norm = scale-normalized TRF "
                        "semantics (ops/robust.py)")
    # framework extensions
    p.add_argument("--rounds", type=int, default=20)
    p.add_argument("--dtype", choices=["float32", "float64"],
                   default="float32")
    p.add_argument("--point-stride", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sharded", action="store_true",
                   help="distribute over all visible devices")
    p.add_argument("--pallas", action="store_true",
                   help="use the Pallas NN kernel")
    p.add_argument("--grid", action="store_true",
                   help="use the grid-hash NN (O(N*K), exact within "
                        "cutoff; gather-bound on TPU — CPU-parity path)")
    p.add_argument("--window", type=int, default=None, metavar="W",
                   help="use the sorted-window NN with W rows per query "
                        "tile (O(N*W) streaming, exact within cutoff; the "
                        "large-cloud backend — combine with --pallas for "
                        "the scalar-prefetch kernel)")
    p.add_argument("--schur", action="store_true",
                   help="Schur-eliminate an independent set of frames "
                        "before the dense solve (Ceres "
                        "use_explicit_schur_complement equivalent)")
    p.add_argument("--pcg", type=int, default=0, metavar="ITERS",
                   help="solve the LM steps with block-Jacobi "
                        "preconditioned CG capped at ITERS iterations "
                        "instead of the dense Cholesky; with --schur "
                        "this is the reference's ITERATIVE_SCHUR + "
                        "SCHUR_JACOBI configuration "
                        "(icp-ceres.cpp:76-80; solvers/pcg.py)")
    p.add_argument("--pcg-tol", type=float, default=1e-8,
                   help="relative residual target for --pcg")
    p.add_argument("--assembly", choices=["auto", "fused", "einsum"],
                   default="auto",
                   help="Hessian assembly path: 'fused' = the Pallas "
                        "Gram-accumulation kernel "
                        "(kernels/assemble_pallas.py), 'einsum' = the "
                        "XLA contraction, 'auto' = fused on TPU for the "
                        "eligible se3/f32 configurations")
    p.add_argument("--fused", action="store_true",
                   help="run the whole outer loop as one on-device "
                        "program (max throughput, no per-round logs)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR")
    p.add_argument("--export-ply", default=None,
                   help="write colored merged cloud after the run")
    p.add_argument("--export-xyz", default=None)
    p.add_argument("--snapshot", default=None, metavar="DIR",
                   help="render a PNG per round into DIR (headless "
                        "replacement for the viewer's per-round redraw)")
    p.add_argument("--snapshot-edge", type=int, default=None, metavar="E",
                   help="with --snapshot: also draw the selected edge E's "
                        "correspondence lines src->dst (the viewer's "
                        "per-edge correspondence display, "
                        "Visualize.cpp:412-481)")
    p.add_argument("--turntable", default=None, metavar="GIF",
                   help="after the run, write an animated-GIF turntable "
                        "orbit of the final registration (the headless "
                        "replacement for the viewer's interactive spin, "
                        "Visualize.cpp:627-757); combine with "
                        "--snapshot-edge to overlay that edge's "
                        "correspondence lines")
    p.add_argument("--checkpoint", default=None,
                   help="npz path; saved every round, resumed if present")
    p.add_argument("--platform", default=None)
    # multi-host (jax.distributed): pass on every host
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 for jax.distributed")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    if args.coordinator:
        from ..parallel import multihost

        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id)

    from ..models import frameset, pipeline
    from ..utils import checkpoint, datasets, export, metrics
    from ..utils.timer import Timer

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    raw = datasets.load_raw_frames(
        args.dir, limit=args.limit, step=args.step, fake=args.fake,
        sigma=args.sigma, sigmat=args.sigmat, seed=args.seed,
        relocalize_with_gt=args.relocalize_gt)
    fs = frameset.from_raw(raw, dtype=dtype,
                           recompute_normals=args.recompute_normals,
                           point_stride=args.point_stride)
    print(f"frames: {fs.num_frames}  points/frame (padded): "
          f"{fs.num_points}  dtype: {dtype.__name__}")

    param = ("se3" if args.sophusSE3 else
             "angle_axis" if args.angleAxis else "quat")
    cfg = pipeline.ICPConfig(
        rounds=args.rounds, knn=args.knn, cutoff=args.cutoff,
        metric=("point_to_plane" if args.point_to_plane
                else "point_to_point"),
        param_name=param, robust=args.robust, loss=args.loss,
        use_autodiff=args.sophusSE3_autodiff, use_pallas=args.pallas,
        use_grid=args.grid, use_window=args.window is not None,
        window=args.window or 8192, prune=args.prune,
        fixed_src_edges=args.anchor_edges, assembly=args.assembly,
        pcg_iters=args.pcg, pcg_tol=args.pcg_tol)

    edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
    print("graph adjacency matrix == block structure")
    print(frameset.adjacency_matrix(edges, fs.num_frames))

    if args.schur:
        if args.g2o:
            print("note: --schur is ignored with --g2o (the pose-graph "
                  "chi2 loop always uses the dense solve)")
        else:
            cfg = pipeline.enable_schur(cfg, fs, edges)
            import numpy as _np

            print(f"schur: eliminating {int(_np.sum(cfg.schur_elim))} of "
                  f"{fs.num_frames} frames before the dense solve")

    start_round = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        fs, start_round, rng = checkpoint.restore(args.checkpoint, fs)
        print(f"resumed from {args.checkpoint} at round {start_round}")
        if rng is not None and int(rng[0]) != args.seed:
            print(f"note: checkpoint was written by a run with "
                  f"--seed {int(rng[0])} (this run: {args.seed}); "
                  "restored poses/GT take precedence")
        extra = checkpoint.restore_extra(args.checkpoint)
        if cfg.use_window and "window" in extra:
            # resume with the W the interrupted run had already learned
            # it needs — re-shrinking below it would waste a search round
            # re-raising (and drop correspondences in fused mode)
            import dataclasses as _dc

            saved_w = int(extra["window"])
            if saved_w > cfg.window:
                print(f"restoring learned window W={saved_w} "
                      f"(was {cfg.window})")
                cfg = _dc.replace(cfg, window=saved_w)

    if cfg.use_window:
        # validate W against the data at the STARTING poses (post-restore —
        # a resumed run must validate against the poses it will search
        # from): uncovered query tiles report no correspondence, so an
        # undersized W silently degrades alignment — auto-raise instead.
        # Poses keep moving during the run; every round additionally
        # reports its live uncovered count (Correspondences.uncovered) and
        # the host loop re-raises W if coverage breaks mid-run.
        cfg = _autoraise_window(cfg, fs, edges)

    print(f"initial alignment RMSE: {metrics.alignment_rmse(fs):.6f}")
    timer = Timer()

    import contextlib

    from ..utils import tracing

    trace_ctx = (tracing.trace(args.trace) if args.trace
                 else contextlib.nullcontext())
    with trace_ctx:
        _run(args, cfg, fs, edges, timer, start_round)


def _autoraise_window(cfg, fs, edges, floor: int = 0):
    """Return cfg with window W >= what the data needs at fs.poses (one
    vmapped program over all edges — pipeline.autoraise_window)."""
    from ..models import pipeline

    return pipeline.autoraise_window(cfg, fs, edges, floor=floor)


def _run(args, cfg, fs, edges, timer, start_round):
    import jax
    import jax.numpy as jnp

    from ..models import frameset, pipeline
    from ..solvers.lm import reason_str as lm_reason
    from ..utils import checkpoint, export, metrics

    def snap(i, fs_now, weights=None, corr=None):
        if args.snapshot:
            import os as _os

            from ..utils import viz

            ce = args.snapshot_edge
            if ce is not None and not 0 <= ce < edges.shape[0]:
                print(f"--snapshot-edge {ce} out of range "
                      f"(E={edges.shape[0]}); ignoring")
                ce = None
            viz.render_scene(
                fs_now, edges=edges, weights=weights, corr=corr,
                corr_edge=ce if corr is not None else None,
                path=_os.path.join(args.snapshot, f"round_{i:03d}.png"),
                title=f"round {i}")

    watch = metrics.DivergenceWatch()

    if args.g2o:
        from ..models import correspond
        from ..solvers import posegraph

        sharded_g2o = args.sharded and len(jax.devices()) > 1
        mesh = None
        if sharded_g2o:
            from ..parallel import mesh as mesh_mod

            mesh = mesh_mod.make_mesh()
            print(f"g2o mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        elif args.sharded:
            print("note: --sharded requested but only one device is "
                  "visible; running the pose-graph solver unsharded")
        g2o_ref_sort = pipeline._window_cache(fs, cfg)
        fused_g2o = args.fused and not sharded_g2o and start_round == 0
        if fused_g2o:
            # the whole alternation in one compiled program (the
            # benchmark path — pipeline.run_gicp_fused)
            import numpy as np

            timer.tic()
            fs, chis, unc, cfg = pipeline.run_gicp_fused_checked(fs, cfg)
            total = timer.toc("fused g2o outer loop", block_on=fs.poses)
            print(f"{args.rounds} fused GICP rounds in {total:.3f}s "
                  f"({total/args.rounds*1e3:.1f} ms/round incl. compile)")
            for i, c in enumerate(np.asarray(chis)):
                extra = (f"  UNCOVERED: {int(unc[i])}" if int(unc[i])
                         else "")
                print(f"round: {i}  chi2: {float(c):.6g}{extra}")
            rmse = metrics.alignment_rmse(fs)
            print(f"final rmse: {rmse:.6f}")
        for i in range(start_round, 0 if fused_g2o else args.rounds):
            timer.tic()
            if sharded_g2o:
                from ..parallel import sharded

                fs, chi2_hist, g2o_rounds, unc = \
                    sharded.sharded_posegraph_round(
                        fs, edges, cfg, mesh,
                        point_to_plane=args.point_to_plane)
                timer.toc(f"round {i}", block_on=fs.poses)
                if cfg.use_window and int(unc):
                    print(f"round {i}: {int(unc)} queries lost window "
                          f"coverage; raising W")
                    cfg = _autoraise_window(cfg, fs, edges,
                                            floor=cfg.window + 2048)
                corr = None
            else:
                corr = correspond.find_correspondences(
                    fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
                    use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
                    grid_k=cfg.grid_k, use_window=cfg.use_window,
                    window=cfg.window, prune=cfg.prune,
                    fixed_src_edges=cfg.fixed_src_edges,
                    ref_sort=g2o_ref_sort)
                if cfg.use_window and int(jnp.sum(corr.uncovered)):
                    print(f"round {i}: {int(jnp.sum(corr.uncovered))} "
                          f"queries lost window coverage; re-sizing W")
                    cfg = _autoraise_window(cfg, fs, edges,
                                            floor=cfg.window + 2048)
                    corr = correspond.find_correspondences(
                        fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
                        use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
                        grid_k=cfg.grid_k, use_window=cfg.use_window,
                        window=cfg.window, prune=cfg.prune,
                        fixed_src_edges=cfg.fixed_src_edges,
                        ref_sort=g2o_ref_sort)
                timer.toc(f"closest pts {i}", block_on=corr.dist)
                timer.tic()
                fs, chi2_hist, g2o_rounds = posegraph.solve_posegraph_fused(
                    fs, edges, corr, point_to_plane=args.point_to_plane)
                timer.toc(f"global {i}", block_on=fs.poses)
            last_chi2 = float(chi2_hist[int(g2o_rounds) - 1])
            rmse = metrics.alignment_rmse(fs)
            print(f"round: {i}  chi2: {last_chi2:.6g} "
                  f"({int(g2o_rounds)} g2o rounds)  "
                  f"rmse: {rmse:.6f}")
            watch.update(rmse, prune_on=cfg.prune)
            snap(i, fs, corr.weight if corr is not None else None,
                 corr=corr)
            if args.checkpoint:
                checkpoint.save(args.checkpoint, fs, i + 1,
                                rng_key=[args.seed],
                                extra={"window": cfg.window})
    elif args.fused:
        import numpy as np

        timer.tic()
        # _checked: if the sorted-window backend loses coverage mid-run,
        # W is re-sized and the whole fused program re-runs from the
        # starting poses rather than returning a degraded result
        fs, costs, unc, cfg = pipeline.run_icp_fused_checked(fs, cfg)
        total = timer.toc("fused outer loop", block_on=fs.poses)
        print(f"{args.rounds} fused rounds in {total:.3f}s "
              f"({total/args.rounds*1e3:.1f} ms/round incl. compile)")
        for i, c in enumerate(np.asarray(costs)):
            print(f"round: {i}  cost: {float(c):.6g}")
    elif args.sharded and len(jax.devices()) > 1:
        from ..parallel import mesh as mesh_mod
        from ..parallel import sharded

        if cfg.use_grid:
            print("note: --grid is ignored under --sharded (brute force, "
                  "--window, or the Pallas kernels run inside shard_map)")
        if cfg.schur_elim is not None:
            print("note: --schur on --sharded eliminates inside each "
                  "device's replicated solve (same reduced system)")
        m = mesh_mod.make_mesh()
        print(f"mesh: {dict(zip(m.axis_names, m.devices.shape))}")
        for i in range(start_round, args.rounds):
            timer.tic()
            fs, unc = sharded.sharded_icp_round(fs, edges, cfg, m)
            timer.toc(f"round {i}", block_on=fs.poses)
            extra = ""
            if cfg.use_window and int(unc):
                extra = (f"  UNCOVERED: {int(unc)} queries — raising W")
                cfg = _autoraise_window(cfg, fs, edges,
                                        floor=cfg.window + 2048)
            rmse = metrics.alignment_rmse(fs)
            print(f"round: {i}  rmse: {rmse:.6f}{extra}")
            watch.update(rmse, prune_on=cfg.prune)
            snap(i, fs)
            if args.checkpoint:
                checkpoint.save(args.checkpoint, fs, i + 1,
                                rng_key=[args.seed],
                                extra={"window": cfg.window})
    else:
        ref_sort = pipeline._window_cache(fs, cfg)   # built once, reused
        for i in range(start_round, args.rounds):
            timer.tic()
            corr = pipeline.correspond.find_correspondences(
                fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
                use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
                use_window=cfg.use_window, window=cfg.window,
                prune=cfg.prune, fixed_src_edges=cfg.fixed_src_edges,
                ref_sort=ref_sort)
            if cfg.use_window and int(jnp.sum(corr.uncovered)):
                # poses drifted past W's coverage: recover loudly —
                # re-size W at the CURRENT poses and redo the search
                print(f"round {i}: {int(jnp.sum(corr.uncovered))} queries "
                      f"lost window coverage; re-sizing W")
                cfg = _autoraise_window(cfg, fs, edges,
                                        floor=cfg.window + 2048)
                corr = pipeline.correspond.find_correspondences(
                    fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
                    use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
                    use_window=cfg.use_window, window=cfg.window,
                    prune=cfg.prune, fixed_src_edges=cfg.fixed_src_edges,
                    ref_sort=ref_sort)
            timer.toc(f"closest pts {i}", block_on=corr.dist)
            timer.tic()
            from ..solvers import multiview as mv

            fs, stats = mv.solve_multiview(
                fs, edges, corr, param_name=cfg.param_name,
                metric=cfg.metric, robust=cfg.robust,
                use_autodiff=cfg.use_autodiff, config=cfg.lm,
                schur_elim=cfg.schur_elim, loss=cfg.loss,
                assembly=cfg.assembly, pcg_iters=cfg.pcg_iters,
                pcg_tol=cfg.pcg_tol)
            timer.toc(f"global {i}", block_on=fs.poses)
            rmse = metrics.alignment_rmse(fs)
            print(f"round: {i}  lm_iters: {int(stats.iterations)}  "
                  f"cost: {float(stats.final_cost):.6g}  "
                  f"rmse: {rmse:.6f}  "
                  f"[{lm_reason(stats)}]")
            watch.update(rmse, prune_on=cfg.prune)
            snap(i, fs, corr.weight, corr=corr)
            if args.checkpoint:
                checkpoint.save(args.checkpoint, fs, i + 1,
                                rng_key=[args.seed],
                                extra={"window": cfg.window})

    if args.fused:
        # the fused branch has no per-round host visibility; render once
        # at the end (other branches snapshot inside their loops)
        snap(args.rounds, fs)
    timer.print_all_timings()
    dt, dr = metrics.mean_pose_error(fs.poses, fs.gt_poses)
    print(f"final alignment RMSE: {metrics.alignment_rmse(fs):.6f}")
    print(f"final gauge-aligned RMSE: {metrics.gauge_aligned_rmse(fs):.6f}"
          " (registration quality net of the anchor's own pose error)")
    print(f"mean pose error: tra={dt:.6g} rot={dr:.6g} deg")
    if getattr(args, "turntable", None):
        from ..utils import viz

        ce = args.snapshot_edge
        if ce is not None and not 0 <= ce < edges.shape[0]:
            ce = None
        corr_final = None
        if ce is not None:
            corr_final = pipeline.correspond.find_correspondences(
                fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
                use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
                use_window=cfg.use_window, window=cfg.window,
                prune=cfg.prune, fixed_src_edges=cfg.fixed_src_edges)
        viz.render_turntable(fs, args.turntable, edges=edges,
                             corr=corr_final, corr_edge=ce)
        print(f"wrote turntable {args.turntable}")
    if args.export_ply:
        n = export.write_ply(args.export_ply, fs, include_gt=True)
        print(f"wrote {n} points to {args.export_ply}")
    if args.export_xyz:
        n = export.write_xyz(args.export_xyz, fs)
        print(f"wrote {n} points to {args.export_xyz}")


if __name__ == "__main__":
    main()
