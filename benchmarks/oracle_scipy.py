"""Independent multiview-ICP oracle: numpy + scipy ONLY.

Cross-implementation check for the framework's converged alignment-RMSE
numbers (BASELINE.json "match reference RMSE on Bunny/dinosaur"). This
deliberately shares NO solver/NN/geometry code with mv_lm_icp_tpu:

- SE3 poses as scipy.spatial.transform.Rotation + translation,
- correspondence search with scipy.spatial.cKDTree (a true KD-tree, like
  the reference's nanoflann, include/nanoflann.hpp),
- the joint robust solve with scipy.optimize.least_squares (TRF,
  soft_l1 loss — the same robust family as Ceres SoftLOneLoss,
  icp-ceres.cpp:283-284), finite-difference Jacobians with the
  block-sparsity pattern of the frame graph,
- its own alignment-RMSE metric.

If this independent f64 CPU pipeline converges to the same RMSE as the
TPU framework on the same workload, the framework's number is validated
against something other than itself. Usage:

    python benchmarks/oracle_scipy.py --dataset dinosaur --rounds 12
    python benchmarks/oracle_scipy.py --dataset bunny --limit 40 --step 8
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy import sparse
from scipy.optimize import least_squares
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation


def se3_apply(rotvec, t, pts):
    return Rotation.from_rotvec(rotvec).apply(pts) + t


def pose_params(F):
    """Flat parameter vector layout: frames 1..F-1, 6 dof each
    (frame 0 is the gauge, pinned)."""
    return np.zeros(6 * (F - 1))


def unpack(x, poses0):
    """Apply tangent updates x to the initial pose list [(rotvec, t)]."""
    out = [poses0[0]]
    for i in range(1, len(poses0)):
        d = x[6 * (i - 1): 6 * i]
        r0, t0 = poses0[i]
        # left-multiplicative update: R = exp(dr) R0, t = t0 + dt
        r = (Rotation.from_rotvec(d[:3]) * Rotation.from_rotvec(r0))
        out.append((r.as_rotvec(), t0 + d[3:]))
    return out


def find_correspondences(frames, poses, edges, cutoff):
    """Per edge: (src_pts_local, dst_idx, ok, weight) via a KD-tree in the
    dst local frame (the reference's transform chain, frame.cpp:131-136)."""
    trees = {}
    corr = []
    for (s, d) in edges:
        if d not in trees:
            trees[d] = cKDTree(frames[d]["pts"])
        rs, ts = poses[s]
        rd, td = poses[d]
        glob = se3_apply(rs, ts, frames[s]["pts"])
        local = Rotation.from_rotvec(rd).inv().apply(glob - td)
        dist, idx = trees[d].query(local, k=1)
        ok = dist < cutoff
        med = np.median(dist[ok]) if ok.any() else 1.0
        corr.append(dict(src=s, dst=d, idx=idx, ok=ok,
                         weight=max(1.5 * med, 1e-12)))
    return corr


def joint_solve(frames, poses, edges, corr, point_to_plane=True):
    """One robust joint solve over all non-fixed poses (scipy TRF)."""
    F = len(frames)
    poses0 = list(poses)

    def residuals(x):
        ps = unpack(x, poses0)
        out = []
        for c in corr:
            s, d = c["src"], c["dst"]
            rs, ts = ps[s]
            rd, td = ps[d]
            p = se3_apply(rs, ts, frames[s]["pts"][c["ok"]])
            q = se3_apply(rd, td, frames[d]["pts"][c["idx"][c["ok"]]])
            if point_to_plane:
                n = Rotation.from_rotvec(rd).apply(
                    frames[d]["nor"][c["idx"][c["ok"]]])
                r = np.sum((p - q) * n, axis=1)
            else:
                r = (p - q).ravel()
            out.append(r / c["weight"])
        return np.concatenate(out) if out else np.zeros(1)

    # block-sparsity of the finite-difference Jacobian: each edge's rows
    # touch only the 6-dof blocks of its two frames
    rows = []
    for c in corr:
        n = int(c["ok"].sum()) * (1 if point_to_plane else 3)
        block = np.zeros(6 * (F - 1), dtype=bool)
        for f in (c["src"], c["dst"]):
            if f > 0:
                block[6 * (f - 1): 6 * f] = True
        rows.append(np.tile(block, (n, 1)))
    pattern = sparse.lil_matrix(np.concatenate(rows)) if rows else None

    res = least_squares(residuals, pose_params(F), loss="soft_l1",
                        f_scale=1.0, jac_sparsity=pattern,
                        max_nfev=400, xtol=1e-12, ftol=1e-10)
    return unpack(res.x, poses0)


def alignment_rmse(frames, poses, gt_poses):
    tot, cnt = 0.0, 0
    for f, pose, gt in zip(frames, poses, gt_poses):
        est = se3_apply(pose[0], pose[1], f["pts"])
        ref = se3_apply(gt[0], gt[1], f["pts"])
        tot += float(np.sum((est - ref) ** 2))
        cnt += f["pts"].shape[0]
    return float(np.sqrt(tot / max(cnt, 1)))


def knn_pose_graph(poses, k):
    """kNN frame graph on pose translation distance (frame.cpp:67-89)."""
    t = np.stack([p[1] for p in poses])
    edges = []
    for i in range(len(poses)):
        d = np.linalg.norm(t - t[i], axis=1)
        d[i] = np.inf
        for j in np.argsort(d)[:k]:
            edges.append((i, int(j)))
    return edges


def run(frames, poses, gt_poses, *, rounds, cutoff, knn=2,
        point_to_plane=True, verbose=True):
    edges = knn_pose_graph(poses, knn)
    history = [alignment_rmse(frames, poses, gt_poses)]
    for i in range(rounds):
        corr = find_correspondences(frames, poses, edges, cutoff)
        poses = joint_solve(frames, poses, edges, corr, point_to_plane)
        history.append(alignment_rmse(frames, poses, gt_poses))
        if verbose:
            print(f"oracle round {i}: rmse {history[-1]:.6f}",
                  file=sys.stderr)
    return poses, history


def se3param_to_rt(p7):
    """pose7 [qx qy qz qw tx ty tz] -> (rotvec, t)."""
    q = np.asarray(p7[:4], float)
    return (Rotation.from_quat(q).as_rotvec(), np.asarray(p7[4:7], float))


def frames_from_raw(raw):
    # np.array (copy): scipy requires writable buffers and the arrays may
    # be read-only jax exports
    frames = [dict(pts=np.array(p, float), nor=np.array(n, float))
              for p, n in zip(raw.points, raw.normals)]
    poses = [se3param_to_rt(p) for p in raw.poses]
    gts = [se3param_to_rt(p) for p in raw.gt_poses]
    return frames, poses, gts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["bunny", "dinosaur"],
                    default="dinosaur")
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--cutoff", type=float, default=None)
    ap.add_argument("--limit", type=int, default=40)
    ap.add_argument("--step", type=int, default=2)
    ap.add_argument("--recompute-normals", action="store_true",
                    default=True)
    args = ap.parse_args(argv)

    # data loading (and only data loading) is shared with the framework
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mv_lm_icp_tpu.ops import pca
    from mv_lm_icp_tpu.utils import datasets

    if args.dataset == "dinosaur":
        raw = datasets.load_raw_frames(datasets.DINOSAUR_DIR, limit=5,
                                       step=1, relocalize_with_gt=True)
        cutoff = args.cutoff if args.cutoff is not None else 10.0
    else:
        raw = datasets.load_raw_frames(datasets.BUNNY_DIR,
                                       limit=args.limit, step=args.step,
                                       sigma=0.02, sigmat=0.01, seed=0)
        cutoff = args.cutoff if args.cutoff is not None else 0.05
    if args.recompute_normals:
        import jax.numpy as jnp

        raw.normals = [np.asarray(pca.recompute_normals(
            jnp.asarray(p), jnp.ones(p.shape[0], bool), k=10)[0])
            for p in raw.points]

    frames, poses, gts = frames_from_raw(raw)
    t0 = time.perf_counter()
    poses, hist = run(frames, poses, gts, rounds=args.rounds,
                      cutoff=cutoff)
    dt = time.perf_counter() - t0
    print(json.dumps({"dataset": args.dataset, "rounds": args.rounds,
                      "cutoff": cutoff, "rmse_initial": hist[0],
                      "rmse_final": hist[-1],
                      "rmse_history": [round(h, 6) for h in hist],
                      "seconds": round(dt, 1)}))


if __name__ == "__main__":
    main()
