"""Pairwise ICP benchmark CLI.

Replicates src/main_pairwise.cpp: load one cloud, build the synthetic GT
pose (AA(pi/4,X)*AA(1,Y)*AA(-0.2,Z), t=(.01,-.01,-.005)), perturb with
addNoise(0.1, 0.1), transform the cloud, then recover the pose with every
solver and report per-solver timing and poseDiff accuracy
(main_pairwise.cpp:29-133). Flags mirror the reference's gflags
(main_pairwise.cpp:24-27); ``--g2o`` selects the GICP pose-graph solver.

(The reference prints the quaternion result on its SophusSE3 accuracy line
— a known bug, main_pairwise.cpp:132 — which we do not reproduce.)

Run:  python -m mv_lm_icp_tpu.cli.pairwise [--pointToPlane] [--g2o] ...
"""
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--pointToPlane", action="store_true",
                   help="use point-to-plane distance metric")
    p.add_argument("--sophusSE3_autodiff", action="store_true",
                   help="automatic instead of analytic differentiation for "
                        "the SE3 parameterization")
    p.add_argument("--g2o", action="store_true",
                   help="also run the GICP pose-graph solver")
    p.add_argument("--ceres", action="store_true", default=True,
                   help="run the LM solvers (default true)")
    p.add_argument("--no-ceres", dest="ceres", action="store_false")
    p.add_argument("--cloud", default=None,
                   help="xyz file (default: Bunny cloudXYZ_0)")
    p.add_argument("--dtype", choices=["float32", "float64"],
                   default="float32")
    p.add_argument("--refine", action="store_true",
                   help="polish the SE3 LM estimate with a few f64 "
                        "Gauss-Newton steps (reference f64 accuracy on "
                        "TPU at a fraction of a full f64 solve; the "
                        "problem is generated in f64 so the target is "
                        "representable)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", default=None,
                   help="force jax platform (cpu/tpu)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from ..ops import se3
    from ..solvers import closedform, lm, posegraph
    from ..utils import datasets
    from ..utils.timer import Timer

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32
    if dtype == jnp.float64 or args.refine:
        jax.config.update("jax_enable_x64", True)

    pts_np, nor_np = datasets.load_single_cloud(args.cloud)
    print(f"loaded {pts_np.shape[0]} points")
    for i in range(3):
        print(" ", pts_np[i], nor_np[i])

    # with --refine the problem is generated in f64 (so the exact pose
    # is representable below f32 resolution) and solved in f32
    gen = jnp.float64 if args.refine else dtype
    pts64 = jnp.asarray(pts_np, gen)
    nor64 = jnp.asarray(nor_np, gen)
    gt = se3.add_noise(jax.random.PRNGKey(args.seed),
                       datasets.synthetic_pairwise_pose(gen), 0.1, 0.1)
    dst64 = se3.apply(gt, pts64)
    nor_dst64 = se3.rotate_only(gt, nor64)
    pts, nor, dst = (a.astype(dtype) for a in (pts64, nor64, dst64))

    timer = Timer()
    results = {}

    if args.pointToPlane:
        nor_dst = nor_dst64.astype(dtype)
        timer.tic()
        results["closed form"] = closedform.point_to_plane(pts, dst, nor_dst)
        timer.toc("closed", block_on=results["closed form"])
        if args.g2o:
            timer.tic()
            est, _ = posegraph.solve_pairwise_gicp(
                pts, dst, nor_dst, point_to_plane=True)
            results["g2o (gicp)"] = est
            timer.toc("g2o", block_on=est)
        if args.ceres:
            for label, pname in [("lm CeresAngleAxis", "angle_axis"),
                                 ("lm EigenQuaternion", "quat"),
                                 ("lm SophusSE3", "se3")]:
                timer.tic()
                est, stats = lm.solve_pairwise(
                    pts, dst, nor_dst, param_name=pname,
                    metric="point_to_plane",
                    use_autodiff=(pname == "se3"
                                  and args.sophusSE3_autodiff))
                results[label] = est
                timer.toc(label, block_on=est)
    else:
        timer.tic()
        results["closed form"] = closedform.point_to_point(pts, dst)
        timer.toc("closed", block_on=results["closed form"])
        if args.g2o:
            timer.tic()
            est, _ = posegraph.solve_pairwise_gicp(pts, dst)
            results["g2o (gicp)"] = est
            timer.toc("g2o", block_on=est)
        if args.ceres:
            for label, pname in [("lm CeresAngleAxis", "angle_axis"),
                                 ("lm EigenQuaternion", "quat"),
                                 ("lm SophusSE3", "se3")]:
                timer.tic()
                est, stats = lm.solve_pairwise(
                    pts, dst, param_name=pname,
                    metric="point_to_point",
                    use_autodiff=(pname == "se3"
                                  and args.sophusSE3_autodiff))
                results[label] = est
                timer.toc(label, block_on=est)

    if args.refine and "lm SophusSE3" in results:
        metric = ("point_to_plane" if args.pointToPlane
                  else "point_to_point")
        timer.tic()
        est, _ = lm.refine_pairwise(
            results["lm SophusSE3"], pts64, dst64,
            nor_dst64 if args.pointToPlane else None,
            metric=metric, iters=3)
        results["lm SE3 + f64 refine"] = est
        timer.toc("refine (3 GN f64)", block_on=est)

    timer.print_all_timings()
    print("\n=====  Accuracy ====")
    for label, est in results.items():
        dt, dr = se3.pose_diff(gt, est.astype(gt.dtype))
        print(f"{label:22s} diff_tra:{float(dt):.6g}\t"
              f"diff_rot_degrees:{float(dr):.6g}")


if __name__ == "__main__":
    main()
