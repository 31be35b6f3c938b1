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
                       loss: str = "soft_l1",
                       method: str = "lm", recompute_normals: bool = False,
                       use_pallas: bool = False, dtype=jnp.float32,
                       fixed_first: bool = True,
                       # CLI-parity knobs (the 19-flag surface + framework
                       # extensions, main_multiview.cpp:30-51):
                       prune: bool = False,
                       fixed_src_edges: bool = False,
                       window: Optional[int] = None,
                       schur: bool = False,
                       fused: bool = False,
                       sharded: bool = False, mesh=None,
                       refine: int = 0,
                       max_iterations: int = 50,
                       assembly: str = "auto", pcg: int = 0):
    """Joint multiview registration (the reference's multiview app as a
    function). ``clouds`` is a list of (Ni, 3) arrays or a FrameSet.

    Framework knobs (each maps 1:1 onto a CLI flag):

    - ``prune``: reject matches with dist > 1.5*median (``--prune``);
    - ``fixed_src_edges``: keep correspondences whose source frame is
      gauge-fixed (extra gauge anchoring; see models/correspond.py);
    - ``window``: sorted-window NN with W rows (``--window W``) — the
      large-cloud backend; combine with ``use_pallas`` for the
      scalar-prefetch kernel;
    - ``schur``: Schur-eliminate an independent frame set before the
      dense solve (``--schur``);
    - ``fused``: run all rounds as ONE on-device program (``--fused``;
      max throughput, history carries per-round cost only);
    - ``sharded``: distribute over ``mesh`` (or all visible devices)
      via shard_map (``--sharded``); LM and GICP both supported;
    - ``refine``: polish the final poses with that many f64 Gauss-Newton
      steps of the JOINT problem (needs jax_enable_x64);
    - ``loss``: "soft_l1" (Ceres semantics) or "soft_l1_norm"
      (scale-normalized TRF semantics; ops/robust.py);
    - ``assembly``: Hessian assembly path — "fused" Pallas Gram kernel /
      "einsum" / "auto" (kernels/assemble_pallas.py);
    - ``pcg``: > 0 solves LM steps with block-Jacobi preconditioned CG
      capped at that many iterations (with ``schur``: the reference's
      ITERATIVE_SCHUR + SCHUR_JACOBI, icp-ceres.cpp:76-80).

    Returns (FrameSet with refined poses, history list). Each history
    entry includes the per-round ``uncovered`` window-coverage counter
    (0 on non-window backends) — nonzero means raise ``window``.
    """
    from .models import frameset, pipeline
    from .solvers import lm as lm_mod
    from .utils import datasets

    if fused and sharded:
        # refuse rather than silently pick one: the fused single-device
        # loop and the shard_map rounds are different execution modes and
        # are not composed (the fused loop would ignore the mesh)
        raise ValueError(
            "fused=True and sharded=True are mutually exclusive: the "
            "fused path runs the whole loop on one device, the sharded "
            "path distributes host-driven rounds over the mesh — pick one")

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

    cfg = pipeline.ICPConfig(
        rounds=rounds, knn=knn, cutoff=cutoff, metric=metric,
        param_name=parameterization, robust=robust, loss=loss,
        use_pallas=use_pallas, prune=prune,
        fixed_src_edges=fixed_src_edges,
        use_window=window is not None, window=window or 8192,
        assembly=assembly, pcg_iters=pcg,
        lm=lm_mod.LMConfig(max_iterations=max_iterations))
    edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
    if schur:
        cfg = pipeline.enable_schur(cfg, fs, edges)

    if sharded and mesh is None:
        from .parallel import mesh as mesh_mod

        mesh = mesh_mod.make_mesh()

    if method == "gicp":
        fs, history = _multiview_gicp(fs, edges, cfg, metric,
                                      sharded=sharded, mesh=mesh,
                                      fused=fused)
    elif fused:
        fs, costs, unc, cfg = pipeline.run_icp_fused_checked(fs, cfg)
        history = [dict(round=i, cost=float(c), uncovered=int(u))
                   for i, (c, u) in enumerate(zip(costs, unc))]
    elif sharded:
        from .parallel import sharded as sharded_mod

        history = []
        for i in range(rounds):
            fs, unc = sharded_mod.sharded_icp_round(fs, edges, cfg, mesh)
            history.append(dict(round=i, uncovered=int(unc)))
    else:
        fs, history = pipeline.run_icp(fs, cfg)

    if refine:
        fs, costs = refine_multiview(fs, edges, cfg, iters=refine)
        history.append(dict(refine_cost_history=[float(c) for c in costs]))
    return fs, history


def _multiview_gicp(fs, edges, cfg, metric, *, sharded=False, mesh=None,
                    fused=False):
    """GICP (g2o-equivalent) outer ICP loop, optionally mesh-sharded or
    fully fused on-device (pipeline.run_gicp_fused)."""
    from .models import correspond, pipeline
    from .solvers import posegraph

    if fused and not sharded:
        fs, chis, unc, cfg = pipeline.run_gicp_fused_checked(fs, cfg)
        return fs, [dict(round=i, chi2=float(c), uncovered=int(u))
                    for i, (c, u) in enumerate(zip(chis, unc))]

    history = []
    p2pl = metric == "point_to_plane"
    ref_sort = pipeline._window_cache(fs, cfg)   # built once, reused
    for i in range(cfg.rounds):
        if sharded and mesh is not None:
            from .parallel import sharded as sharded_mod

            fs, chi2_hist, g2o_rounds, unc = \
                sharded_mod.sharded_posegraph_round(
                    fs, edges, cfg, mesh, point_to_plane=p2pl)
            history.append({"chi2": float(chi2_hist[int(g2o_rounds) - 1]),
                            "g2o_rounds": int(g2o_rounds),
                            "uncovered": int(unc)})
        else:
            corr = correspond.find_correspondences(
                fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
                use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
                grid_k=cfg.grid_k, use_window=cfg.use_window,
                window=cfg.window, prune=cfg.prune,
                fixed_src_edges=cfg.fixed_src_edges, ref_sort=ref_sort)
            fs, chi2_hist, g2o_rounds = posegraph.solve_posegraph_fused(
                fs, edges, corr, point_to_plane=p2pl)
            history.append({"chi2": float(chi2_hist[int(g2o_rounds) - 1]),
                            "g2o_rounds": int(g2o_rounds)})
    return fs, history


def refine_multiview(fs, edges, cfg, iters: int = 3):
    """Polish converged multiview poses with f64 Gauss-Newton steps of the
    joint problem (the pairwise lm.refine_pairwise, lifted to the frame
    graph). Requires jax_enable_x64 for an actual precision gain; warns
    otherwise. Returns (FrameSet, per-step cost history)."""
    import jax
    import jax.numpy as jnp
    import warnings

    from .models import correspond
    from .solvers import lm as lm_mod, multiview as mv
    from .ops import residuals as res_mod

    if not jax.config.jax_enable_x64:
        warnings.warn(
            "refine_multiview: jax_enable_x64 is off — the f64 polish "
            "runs in f32; set JAX_ENABLE_X64=1 at startup", stacklevel=2)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else fs.points.dtype
    fs64 = fs.replace(
        points=fs.points.astype(dtype), normals=fs.normals.astype(dtype),
        poses=fs.poses.astype(dtype), gt_poses=fs.gt_poses.astype(dtype))
    corr = correspond.find_correspondences(
        fs64, edges, cfg.cutoff, chunk=cfg.nn_chunk, prune=cfg.prune,
        fixed_src_edges=cfg.fixed_src_edges)
    param = res_mod.PARAMS["se3"]
    system = mv.make_multiview_system(param, cfg.metric, fs64, edges, corr,
                                      robust=cfg.robust, loss=cfg.loss)
    free = (~fs64.fixed).astype(dtype)
    xs = jax.vmap(param.from_pose7)(fs64.poses)
    costs = []
    for _ in range(iters):
        cost, g, H = system(xs)
        Hd = H + 1e-12 * jnp.diag(jnp.diagonal(H))
        # Cholesky, not LU: the damped gauge-fixed system is SPD, and
        # the TPU backend implements LuDecomposition only for f32 while
        # the f64 polish is this function's whole point
        L = jnp.linalg.cholesky(Hd)
        delta = jax.scipy.linalg.cho_solve((L, True), -g)
        d = delta.reshape(fs64.num_frames, 6) * free[:, None]
        xs = jax.vmap(param.boxplus)(xs, d)
        costs.append(cost)
    poses = jax.vmap(param.to_pose7)(xs)
    # keep the refined precision in the poses (the clouds stay at the
    # original dtype; mixed-leaf pytrees are fine)
    return fs.replace(poses=poses), costs
