"""Correspondence search: the first ICP phase, per frame-graph edge.

TPU-native replacement for ``Frame::computeClosestPointsToNeighbours``
(reference: src/internal/frame.cpp:91-185), the reference's hot loop:
for each edge (src -> dst), every src point is chained through
``dstPose^-1 * srcPose`` into the dst local frame (frame.cpp:131-136), 1-NN
queried against the dst cloud (KD-tree there; tiled brute force here), kept
if distance < cutoff (frame.cpp:156-160), and the edge's robust scale is
``1.5 * median(kept distances)`` (frame.cpp:166-176).

Fixed-shape formulation: instead of ragged per-edge lists, every edge
carries a full [N] slot per src point with a validity mask — the masked
median proves equal to the reference's median-over-pruned-list because
masked entries sort to +inf (ops/nn.masked_median).

Fixed src frames produce no correspondences at all (frame.cpp:93), matching
the reference's early return.
"""
from __future__ import annotations

from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from ..ops import nn, se3
from .frameset import FrameSet


@flax.struct.dataclass
class Correspondences:
    nn_idx: jnp.ndarray   # [E, N] int32 — dst index for each src point
    dist: jnp.ndarray     # [E, N] — euclidean distance in dst frame
    valid: jnp.ndarray    # [E, N] bool — < cutoff, src valid, src not fixed
    weight: jnp.ndarray   # [E] — 1.5 * median(valid dists) (robust scale)
    # [E] int32 — real queries whose window tile lost the coverage proof
    # (sorted-window backend only; always 0 elsewhere). Nonzero means the
    # configured W silently under-covers at the CURRENT poses and those
    # queries were reported unmatched — the pipeline surfaces this per
    # round instead of letting alignment quietly degrade (frame.cpp:156-160
    # guarantees every point a true NN; this is the masked-shape analogue).
    uncovered: jnp.ndarray = None


@partial(jax.jit, static_argnames=("chunk", "use_pallas", "use_grid",
                                   "grid_k", "use_window", "window",
                                   "prune", "fixed_src_edges"))
def find_correspondences(fs: FrameSet, edges: jnp.ndarray, cutoff: float,
                         chunk: int = 2048, use_pallas: bool = False,
                         use_grid: bool = False, grid_k: int = 128,
                         use_window: bool = False,
                         window: int = 8192,
                         prune: bool = False,
                         fixed_src_edges: bool = False,
                         ref_sort=None) -> Correspondences:
    """All-edges correspondence search (ApproachComponents::
    computeClosestPoints, main_multiview.cpp:119-127).

    Backends (all exact in the kept set — the pipeline discards
    dist >= cutoff anyway, frame.cpp:156-160):

    - default: XLA tiled brute force (exact 1-NN);
    - ``use_pallas``: the batched Pallas TPU kernel (exact 1-NN);
    - ``use_window``: sorted-window sweep, O(N*W) streaming — the large-
      cloud backend on TPU (exact within cutoff);
    - ``use_grid``: O(N*K) grid hash (exact within cutoff; gather-bound
      on TPU, mainly the CPU/host-parity backend).

    ``prune`` additionally rejects matches with dist > 1.5 * median —
    the statistical outlier rejection the reference carries COMMENTED
    OUT (frame.cpp:178-183). Off by default to match the reference's
    shipped behaviour; measurably stabilizes low-overlap configurations
    (BENCHMARKS.md 'low-overlap drift').

    ``fixed_src_edges``: also search edges whose SOURCE frame is
    gauge-fixed. The reference skips them entirely (frame.cpp:93,
    icp-ceres.cpp:255), which throws away every correspondence anchoring
    the free frames to the gauge through frame 0's viewpoint; the joint
    solve handles them exactly (fixed rows/cols are eliminated, the dst
    blocks still constrain). On the low-overlap dinosaur workload the
    extra anchoring closes the round-2 accuracy gap vs the independent
    scipy oracle (which keeps these edges): RMSE 3.49 -> oracle-level.
    Off by default for reference parity.
    """
    cutoff = jnp.asarray(cutoff, fs.points.dtype)
    src_idx, dst_idx = edges[:, 0], edges[:, 1]

    if use_pallas:
        # single batched kernel launch over every edge at once
        rel = jax.vmap(lambda s, d: se3.compose(
            se3.inverse(fs.poses[d]), fs.poses[s]))(src_idx, dst_idx)
        queries = jax.vmap(se3.apply)(rel, fs.points[src_idx])
        if use_window:
            from ..kernels import nn_window_pallas

            # build-index-once (frame.cpp:187-206): ``ref_sort`` is the
            # per-FRAME sorted cache (models/frameset.sort_cache),
            # gathered per edge here; without it every call re-argsorts
            # the pose-invariant destination clouds
            rs_e = None
            if ref_sort is not None:
                rs_e = jax.tree_util.tree_map(lambda a: a[dst_idx],
                                              ref_sort)
            idx, d2, unc = nn_window_pallas.nn_1_window_batch(
                queries, fs.points[dst_idx], fs.valid[dst_idx], cutoff,
                window=window, query_valid=fs.valid[src_idx],
                ref_sort=rs_e)
            idx = jnp.maximum(idx, 0)   # -1 rows carry d2=inf -> pruned
        else:
            from ..kernels import nn_pallas

            idx, d2 = nn_pallas.nn_1_batch(queries, fs.points[dst_idx],
                                           fs.valid[dst_idx])
            unc = jnp.zeros(edges.shape[0], jnp.int32)
        dist = jnp.sqrt(d2).astype(fs.points.dtype)
        ok = jnp.logical_and(dist < cutoff, fs.valid[src_idx])
        if not fixed_src_edges:
            ok = jnp.logical_and(ok, ~fs.fixed[src_idx][:, None])
        weight = 1.5 * nn.masked_median(dist, ok)
        if prune:
            ok = jnp.logical_and(ok, dist <= weight[:, None])
        return Correspondences(nn_idx=idx, dist=dist, valid=ok,
                               weight=weight, uncovered=unc)

    def per_edge(edge):
        src, dst = edge[0], edge[1]
        src_pts = fs.points[src]
        rel = se3.compose(se3.inverse(fs.poses[dst]), fs.poses[src])
        query = se3.apply(rel, src_pts)            # src pts in dst frame
        if use_window:
            from ..ops import nn_window

            idx, d2, unc = nn_window.nn_1_window(query, fs.points[dst],
                                                 fs.valid[dst], cutoff,
                                                 window=window,
                                                 query_valid=fs.valid[src])
            idx = jnp.maximum(idx, 0)  # -1 rows carry d2=inf -> pruned
        elif use_grid:
            from ..ops import nn_grid

            idx, d2 = nn_grid.nn_1_grid(query, fs.points[dst],
                                        fs.valid[dst], cutoff,
                                        k_per_cell=grid_k)
            idx = jnp.maximum(idx, 0)  # -1 rows carry d2=inf -> pruned
        else:
            idx, d2 = nn.nn_1(query, fs.points[dst], fs.valid[dst],
                              chunk=chunk)
        if not use_window:
            unc = jnp.zeros((), jnp.int32)
        dist = jnp.sqrt(d2)
        ok = jnp.logical_and(dist < cutoff, fs.valid[src])
        if not fixed_src_edges:
            ok = jnp.logical_and(ok, ~fs.fixed[src])
        weight = 1.5 * nn.masked_median(dist, ok)
        if prune:
            ok = jnp.logical_and(ok, dist <= weight)
        return idx, dist, ok, weight, unc

    idx, dist, ok, weight, unc = jax.lax.map(per_edge, edges)
    return Correspondences(nn_idx=idx, dist=dist, valid=ok, weight=weight,
                           uncovered=unc)
