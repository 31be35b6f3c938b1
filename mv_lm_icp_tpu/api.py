"""High-level registration API — the one-import surface.

The reference exposes its capabilities only through two demo binaries;
this module packages the same capabilities as library calls:

    import mv_lm_icp_tpu as mv

    pose = mv.register_pair(src, dst)                      # (7,) [q, t]
    pose = mv.register_pair(src, dst, normals=n,
                            method="lm", metric="point_to_plane",
                            parameterization="se3")
    fs, info = mv.register_multiview(list_of_clouds, init_poses=...)

Methods: "lm" (Levenberg-Marquardt, the Ceres equivalent),
"closedform" (Eggert SVD / Low), "gicp" (pose-graph, the g2o
equivalent). Poses are se3 7-vectors [qx,qy,qz,qw,tx,ty,tz]; use
ops.se3.to_matrix / from_matrix to interoperate with 4x4 matrices.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np


def register_pair(src, dst, normals=None, *, method: str = "lm",
                  metric: Optional[str] = None,
                  parameterization: str = "se3", robust: bool = False,
                  robust_scale: float = 1.0, weights=None,
                  max_iterations: int = 50, x0=None, refine: int = 0):
    """Rigid pose T with T(src[i]) ~ dst[i] over given correspondences.

    ``normals`` are destination normals; providing them defaults the
    metric to point-to-plane (the reference's pairwise semantics,
    main_pairwise.cpp:71-92). Returns the se3 pose 7-vector.

    ``refine`` > 0 (method "lm" only) polishes the result with that many
    f64 Gauss-Newton steps (reference-grade f64 accuracy on TPU; needs
    jax_enable_x64 — see solvers/lm.refine_pairwise).
    """
    from .solvers import closedform, lm, posegraph

    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    if normals is not None:
        normals = jnp.asarray(normals)
    if metric is None:
        metric = "point_to_plane" if normals is not None \
            else "point_to_point"

    if method == "closedform":
        if metric == "point_to_plane":
            return closedform.point_to_plane(src, dst, normals, weights)
        return closedform.point_to_point(src, dst, weights)
    if method == "gicp":
        pose, _ = posegraph.solve_pairwise_gicp(
            src, dst, normals,
            point_to_plane=(metric == "point_to_plane"),
            config=lm.LMConfig(max_iterations=max_iterations * 6))
        return pose
    if method == "lm":
        pose, _ = lm.solve_pairwise(
            src, dst, normals, param_name=parameterization, metric=metric,
            weights=weights,
            loss=("soft_l1" if robust else "trivial"),
            loss_scale=robust_scale, x0=x0,
            config=lm.LMConfig(max_iterations=max_iterations))
        if refine:
            pose, _ = lm.refine_pairwise(
                pose, src, dst, normals, metric=metric, weights=weights,
                loss=("soft_l1" if robust else "trivial"),
                loss_scale=robust_scale, iters=refine)
        return pose
    raise ValueError(f"unknown method {method!r}")


def register_multiview(clouds: Union[Sequence, "object"], *,
                       normals: Optional[Sequence] = None,
                       init_poses=None, gt_poses=None,
                       rounds: int = 20, knn: int = 2,
                       cutoff: float = 0.05,
                       metric: str = "point_to_plane",
                       parameterization: str = "se3", robust: bool = True,
                       method: str = "lm", recompute_normals: bool = False,
                       use_pallas: bool = False, dtype=jnp.float32,
                       fixed_first: bool = True):
    """Joint multiview registration (the reference's multiview app as a
    function). ``clouds`` is a list of (Ni, 3) arrays or a FrameSet.

    Returns (FrameSet with refined poses, history list).
    """
    from .models import frameset, pipeline
    from .utils import datasets

    if isinstance(clouds, frameset.FrameSet):
        fs = clouds
    else:
        clouds = [np.asarray(c, np.float64) for c in clouds]
        if normals is None:
            normals_list: List[np.ndarray] = [
                np.tile([0.0, 0.0, -1.0], (c.shape[0], 1)) for c in clouds]
            if metric == "point_to_plane":
                recompute_normals = True
        else:
            normals_list = [np.asarray(n, np.float64) for n in normals]
        F = len(clouds)
        ident = np.tile(np.asarray([0, 0, 0, 1, 0, 0, 0], np.float64),
                        (F, 1))
        poses = np.asarray(init_poses, np.float64) if init_poses is not None \
            else ident.copy()
        gts = np.asarray(gt_poses, np.float64) if gt_poses is not None \
            else poses.copy()
        raw = datasets.RawFrames(clouds, normals_list, poses, gts)
        fs = frameset.from_raw(raw, dtype=dtype, fix_first=fixed_first,
                               recompute_normals=recompute_normals)

    cfg = pipeline.ICPConfig(rounds=rounds, knn=knn, cutoff=cutoff,
                             metric=metric, param_name=parameterization,
                             robust=robust, use_pallas=use_pallas)
    if method == "gicp":
        from .models import correspond, frameset as fsm
        from .solvers import posegraph

        edges = fsm.knn_pose_graph(fs.poses, cfg.knn)
        history = []
        for _ in range(rounds):
            corr = correspond.find_correspondences(
                fs, edges, cfg.cutoff, use_pallas=use_pallas)
            fs, chi2 = posegraph.solve_posegraph(
                fs, edges, corr,
                point_to_plane=(metric == "point_to_plane"))
            history.append({"chi2": chi2[-1]})
        return fs, history
    return pipeline.run_icp(fs, cfg)
