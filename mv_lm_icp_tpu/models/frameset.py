"""The scene data model: a fixed-shape, SoA, pytree FrameSet.

TPU-native replacement for the reference's pointer-linked ``Frame`` object
graph (reference: include/frame.h:38-92, src/internal/frame.cpp): instead
of per-frame STL vectors, lazy KD-trees and in-place pose mutation, the
whole scene is one pytree of padded arrays —

  points  [F, N, 3]   (ragged clouds padded; see utils/datasets.pad_clouds)
  normals [F, N, 3]
  valid   [F, N]      point validity mask
  poses   [F, 7]      current estimates, se3 params [qxyzw, t]
  gt_poses[F, 7]      ground truth (for evaluation only)
  fixed   [F]         gauge anchors (frame 0, main_multiview.cpp:141)

— so every stage (graph build, correspondence search, solve) is a pure
jittable function FrameSet -> FrameSet and the frames axis can be sharded
over a device mesh.

The frame graph (``knn_pose_graph``) replicates
``Frame::computePoseNeighboursKnn`` (frame.cpp:67-89): each frame's k
nearest *other* frames by pose-translation distance, as a dense [F, k]
neighbour array flattened to directed edges [E=F*k, 2]. Fixed frames keep
their outgoing edges in the array but contribute nothing downstream (the
reference skips them in computeClosestPointsToNeighbours, frame.cpp:93).
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pca


@flax.struct.dataclass
class FrameSet:
    points: jnp.ndarray       # [F, N, 3]
    normals: jnp.ndarray      # [F, N, 3]
    valid: jnp.ndarray        # [F, N] bool
    poses: jnp.ndarray        # [F, 7]
    gt_poses: jnp.ndarray     # [F, 7]
    fixed: jnp.ndarray        # [F] bool

    @property
    def num_frames(self) -> int:
        return self.points.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[1]


def from_raw(raw, dtype=jnp.float32, fix_first: bool = True,
             recompute_normals: bool = True, pad_multiple: int = 256,
             n_points: Optional[int] = None,
             point_stride: int = 1) -> FrameSet:
    """Build a FrameSet from utils.datasets.RawFrames.

    ``recompute_normals`` replicates the FLAGS_recomputeNormals path
    (main_multiview.cpp:68-70): per-point PCA normals from 10 neighbours.
    It defaults to True like the reference flag — and that default
    matters: the Bunny_RealData *file* normals are biased enough that the
    point-to-plane alternation creeps away from ground truth indefinitely
    (~0.001 RMSE/round, no fixed point), while PCA normals lock it at the
    dataset's internal-consistency floor (see BENCHMARKS.md).
    ``point_stride`` subsamples points (testing/preview knob; the reference
    has no equivalent — frame stride is ``step`` at load time instead).
    """
    from ..utils import datasets as ds

    pts_list = [p[::point_stride] for p in raw.points]
    nor_list = [n[::point_stride] for n in raw.normals]
    pts, nor, mask = ds.pad_clouds(pts_list, nor_list,
                                   pad_multiple=pad_multiple,
                                   n_points=n_points)
    fs = FrameSet(
        points=jnp.asarray(pts, dtype),
        normals=jnp.asarray(nor, dtype),
        valid=jnp.asarray(mask),
        poses=jnp.asarray(raw.poses, dtype),
        gt_poses=jnp.asarray(raw.gt_poses, dtype),
        fixed=jnp.asarray(
            np.arange(len(pts_list)) == 0 if fix_first
            else np.zeros(len(pts_list), bool)),
    )
    if recompute_normals:
        normals, _ = jax.vmap(
            lambda p, v: pca.recompute_normals(p, v, k=10))(
                fs.points, fs.valid)
        fs = fs.replace(normals=normals)
    return fs


def sort_cache(fs: FrameSet):
    """Per-frame sorted-axis index for the windowed NN backend — the
    build-index-once amortization of the reference's lazy per-frame
    KD-trees (``if(indexComputed) return``, frame.cpp:187-206): local
    clouds are pose-invariant, so this is computed once per run and
    reused by every round's correspondence search
    (kernels/nn_window_pallas.RefSort)."""
    from ..kernels import nn_window_pallas

    return nn_window_pallas.sort_ref_batch(fs.points, fs.valid)


def knn_pose_graph(poses: jnp.ndarray, k: int):
    """Directed kNN frame graph by pose-translation distance.

    Replicates Frame::computePoseNeighboursKnn (frame.cpp:67-89): for each
    frame, the k nearest other frames (partial_sort by translation L2).

    Returns edges int32 [F*k, 2] rows (src, dst), ordered by (src, rank).
    """
    t = poses[:, 4:7]
    F = t.shape[0]
    d = jnp.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    d = d + jnp.where(jnp.eye(F, dtype=bool), jnp.inf, 0.0)
    _, nbr = jax.lax.top_k(-d, k)                    # [F, k] ascending dist
    src = jnp.repeat(jnp.arange(F, dtype=jnp.int32), k)
    dst = nbr.reshape(-1).astype(jnp.int32)
    return jnp.stack([src, dst], axis=1)


def adjacency_matrix(edges: jnp.ndarray, num_frames: int) -> np.ndarray:
    """Dense 0/1 adjacency for logging — the reference prints this as the
    'block structure' (main_multiview.cpp:115-116)."""
    A = np.zeros((num_frames, num_frames), dtype=np.int32)
    e = np.asarray(edges)
    A[e[:, 0], e[:, 1]] = 1
    return A
