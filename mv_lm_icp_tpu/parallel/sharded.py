"""Sharded multiview ICP: correspondence search and Hessian assembly
distributed over an (edge, point) device mesh via shard_map + XLA
collectives.

This is the distributed redesign of the reference's single-thread loop
(reference: src/main_multiview.cpp:150-169) per SURVEY §2.3/§5:

- the frame-graph edge axis is partitioned across the ``edge`` mesh axis
  (each device searches correspondences and accumulates 6x6 Hessian
  blocks only for its edges),
- the per-edge point axis is partitioned across the ``point`` mesh axis
  (each device queries a slice of the src cloud; the per-edge robust
  median is computed from an all_gather of the distance slices),
- the blocked normal equations are psum-reduced over both axes and the
  tiny gauge-fixed [6F, 6F] LM solve runs replicated on every device —
  communication is O(F^2) floats per LM iteration, independent of point
  count, riding ICI.

The same program scales to multiple hosts by initializing
``jax.distributed`` and building the mesh over all processes' devices.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..models import frameset
from ..models.pipeline import ICPConfig
from ..ops import nn, residuals as res_mod, robust as robust_mod, se3
from ..solvers import lm as lm_mod
from . import assemble
from . import mesh as mesh_mod

_HI = jax.lax.Precision.HIGHEST


def pad_edges(edges: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Pad the edge list to a multiple of the edge-mesh size with the
    invalid sentinel (-1, -1).

    Padded rows are masked out unconditionally inside the sharded rounds
    (``_device_correspondences`` drops every correspondence of a
    sentinel edge), so padding can never contribute to the system. A
    frame-0 self-loop pad would rely on the fixed-frame mask, which the
    ``fixed_src_edges`` (--anchor-edges) mode disables — self-matches
    then have distance 0, a zero robust scale, and a near-singular
    soft_l1_norm reweight that overflows the Hessian."""
    E = edges.shape[0]
    target = -(-E // multiple) * multiple
    if target == E:
        return edges
    pad = jnp.full((target - E, 2), -1, dtype=edges.dtype)
    return jnp.concatenate([edges, pad], axis=0)


def _device_correspondences(fs_rep, edges_loc, cfg: ICPConfig, N: int,
                            n_point: int, ref_sort=None):
    """Per-device correspondence stage shared by the LM and GICP rounds
    (runs inside shard_map): search this device's point slice of its edge
    slice with any of the four NN backends, robust scale from the
    point-axis all_gather of distances (frame.cpp:166-176 semantics over
    the full edge).

    ``edges_loc`` may contain (-1, -1) sentinel rows from
    :func:`pad_edges`; every correspondence of such a row is marked
    invalid (the caller must clamp its own copy of the indices before
    gathering with them).

    Returns (idxs [El, nloc], dists, oks, weights [El], starts [El],
    nloc, uncovered int32 — psum'd over the whole mesh).
    """
    pidx = jax.lax.axis_index(mesh_mod.POINT_AXIS)
    nloc = N // n_point
    start = pidx * nloc
    edge_valid = edges_loc[:, 0] >= 0       # pad sentinel rows -> False
    edges_loc = jnp.maximum(edges_loc, 0)   # clamp for safe gathers
    src_idx, dst_idx = edges_loc[:, 0], edges_loc[:, 1]

    def edge_query(edge):
        src, dst = edge[0], edge[1]
        src_pts = jax.lax.dynamic_slice_in_dim(
            fs_rep.points[src], start, nloc, axis=0)
        src_valid = jax.lax.dynamic_slice_in_dim(
            fs_rep.valid[src], start, nloc, axis=0)
        rel = se3.compose(se3.inverse(fs_rep.poses[dst]),
                          fs_rep.poses[src])
        return se3.apply(rel, src_pts), src_valid

    queries, src_valid = jax.vmap(edge_query)(edges_loc)  # (El, nloc, 3)

    if cfg.use_window and cfg.use_pallas:
        from ..kernels import nn_window_pallas

        # per-frame sorted cache (replicated) -> per-edge gather; the
        # build-index-once amortization (frame.cpp:187-206)
        rs_e = None
        if ref_sort is not None:
            rs_e = jax.tree_util.tree_map(lambda a: a[dst_idx], ref_sort)
        idxs, d2s, unc = nn_window_pallas.nn_1_window_batch(
            queries, fs_rep.points[dst_idx], fs_rep.valid[dst_idx],
            cfg.cutoff, window=cfg.window, query_valid=src_valid,
            ref_sort=rs_e)
        idxs = jnp.maximum(idxs, 0)   # -1 rows carry d2=inf -> pruned
        d2s = d2s.astype(queries.dtype)
    elif cfg.use_window:
        from ..ops import nn_window

        def edge_window(args):
            q, qv, dst = args
            idx, d2, u = nn_window.nn_1_window(
                q, fs_rep.points[dst], fs_rep.valid[dst], cfg.cutoff,
                window=cfg.window, query_valid=qv)
            return jnp.maximum(idx, 0), d2, u

        idxs, d2s, unc = jax.lax.map(
            edge_window, (queries, src_valid, dst_idx))
    elif cfg.use_pallas:
        from ..kernels import nn_pallas

        idxs, d2s = nn_pallas.nn_1_batch(
            queries, fs_rep.points[dst_idx], fs_rep.valid[dst_idx])
        d2s = d2s.astype(queries.dtype)
        unc = jnp.zeros((), jnp.int32)
    else:
        def edge_brute(args):
            q, dst = args
            return nn.nn_1(q, fs_rep.points[dst], fs_rep.valid[dst],
                           chunk=min(cfg.nn_chunk, N))

        idxs, d2s = jax.lax.map(edge_brute, (queries, dst_idx))
        unc = jnp.zeros((), jnp.int32)

    dists = jnp.sqrt(d2s)
    oks = jnp.logical_and(dists < cfg.cutoff, src_valid)
    oks = jnp.logical_and(oks, edge_valid[:, None])
    if not cfg.fixed_src_edges:
        oks = jnp.logical_and(oks, ~fs_rep.fixed[src_idx][:, None])
    # robust scale needs each whole edge's distances: gather the
    # point-axis shards (nloc * n_point = N values per edge)
    dist_all = jax.lax.all_gather(
        dists, mesh_mod.POINT_AXIS, tiled=True, axis=1)
    ok_all = jax.lax.all_gather(
        oks, mesh_mod.POINT_AXIS, tiled=True, axis=1)
    weights = 1.5 * nn.masked_median(dist_all, ok_all)
    if cfg.prune:
        oks = jnp.logical_and(oks, dists <= weights[:, None])
    uncovered = jax.lax.psum(jnp.sum(unc),
                             (mesh_mod.EDGE_AXIS, mesh_mod.POINT_AXIS))
    starts = jnp.full(edges_loc.shape[0], start, jnp.int32)
    return idxs, dists, oks, weights, starts, nloc, uncovered


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def sharded_icp_round(fs: frameset.FrameSet, edges: jnp.ndarray,
                      cfg: ICPConfig, mesh, ref_sort=None):
    """One distributed (correspondence, joint-solve) ICP round.

    FrameSet is replicated (frames are small relative to HBM; the sharded
    work is the O(E * N^2) correspondence search and O(E * N) assembly).
    All four NN backends run under the mesh — brute XLA, brute Pallas,
    sorted-window XLA, and the sorted-window Pallas kernel (the
    large-scene path, frame.cpp:91-185 at scale): each device searches
    only its point slice of its edge slice.

    Returns (FrameSet with updated poses (replicated), uncovered int32 —
    total valid queries that lost the window-coverage proof this round;
    always 0 on the non-window backends).
    """
    param = res_mod.PARAMS[cfg.param_name]
    metric = cfg.metric
    n_edge = mesh.shape[mesh_mod.EDGE_AXIS]
    n_point = mesh.shape[mesh_mod.POINT_AXIS]
    edges = pad_edges(edges, n_edge)
    F = fs.num_frames
    N = fs.num_points
    assert N % n_point == 0, (N, n_point)
    free = (~fs.fixed).astype(fs.points.dtype)
    free6 = jnp.repeat(free, 6)
    loss_fn = (robust_mod.LOSSES[cfg.loss] if cfg.robust
               else robust_mod.trivial)

    def device_fn(fs_rep, edges_loc, rs_rep):
        """Runs per device: edges_loc is this device's edge slice; the
        point axis is sliced by this device's coordinate."""
        (idxs, dists, oks, weights, starts, nloc,
         uncovered) = _device_correspondences(fs_rep, edges_loc, cfg, N,
                                              n_point, ref_sort=rs_rep)
        # pad sentinel rows: oks is already all-False for them; clamp the
        # indices so the gathers/scatters below stay in range
        edges_loc = jnp.maximum(edges_loc, 0)
        src_idx, dst_idx = edges_loc[:, 0], edges_loc[:, 1]

        if cfg.comm == "blocks":
            # edge keys are LM-iteration-invariant: gather them once
            src_all = jax.lax.all_gather(
                src_idx, mesh_mod.EDGE_AXIS, tiled=True, axis=0)
            dst_all = jax.lax.all_gather(
                dst_idx, mesh_mod.EDGE_AXIS, tiled=True, axis=0)

        def build_system(xs):
            def edge_terms(e):
                src, dst = src_idx[e], dst_idx[e]
                p = jax.lax.dynamic_slice_in_dim(
                    fs_rep.points[src], starts[e], nloc, axis=0)
                q = fs_rep.points[dst][idxs[e]]
                nrm = fs_rep.normals[dst][idxs[e]]
                r, Jh, Jk = res_mod.residuals_and_jacobians(
                    param, metric, xs[src], xs[dst], p, q, nrm)
                s = jnp.sum(r * r, -1) if metric == "point_to_point" else r * r
                rho, w = loss_fn(s, weights[e])
                w = w * oks[e].astype(p.dtype)
                cost_e = 0.5 * jnp.sum(rho * oks[e].astype(p.dtype))
                if metric == "point_to_point":
                    g_h = jnp.einsum("nij,ni->j", Jh, w[:, None] * r,
                                     precision=_HI)
                    g_k = jnp.einsum("nij,ni->j", Jk, w[:, None] * r,
                                     precision=_HI)
                    H_hh = jnp.einsum("nij,n,nik->jk", Jh, w, Jh,
                                      precision=_HI)
                    H_hk = jnp.einsum("nij,n,nik->jk", Jh, w, Jk,
                                      precision=_HI)
                    H_kk = jnp.einsum("nij,n,nik->jk", Jk, w, Jk,
                                      precision=_HI)
                else:
                    return res_mod.p2pl_system_terms(
                        r, Jh, Jk, w, rho, oks[e].astype(p.dtype))
                return cost_e, g_h, g_k, H_hh, H_hk, H_kk

            # vmap (not lax.map): each device owns few edges, so batching
            # them keeps the MXU fed — same shape as the single-device
            # path (solvers/multiview.py) and the sharded GICP path below.
            # Measured on the 8-device CPU mesh: see BENCHMARKS.md.
            cost_e, g_h, g_k, H_hh, H_hk, H_kk = jax.vmap(edge_terms)(
                jnp.arange(edges_loc.shape[0]))
            cost = jnp.sum(cost_e)
            cost = jax.lax.psum(cost, (mesh_mod.EDGE_AXIS,
                                       mesh_mod.POINT_AXIS))
            if cfg.comm == "blocks":
                # move O(E) per-edge 6x6 blocks, not the O(F^2) dense
                # system: psum the point-split partials of OUR edges,
                # all_gather everyone's edge blocks, assemble on-device
                gh, gk, hhh, hhk, hkk = [
                    jax.lax.all_gather(
                        jax.lax.psum(x, mesh_mod.POINT_AXIS),
                        mesh_mod.EDGE_AXIS, tiled=True, axis=0)
                    for x in (g_h, g_k, H_hh, H_hk, H_kk)]
                G, H = assemble.assemble_dense(
                    F, src_all, dst_all, gh, gk, hhh, hhk, hkk)
            else:
                G, H = assemble.assemble_dense(
                    F, src_idx, dst_idx, g_h, g_k, H_hh, H_hk, H_kk)
                G = jax.lax.psum(G, (mesh_mod.EDGE_AXIS,
                                     mesh_mod.POINT_AXIS))
                H = jax.lax.psum(H, (mesh_mod.EDGE_AXIS,
                                     mesh_mod.POINT_AXIS))
            g = G.reshape(F * 6) * free6
            Hm = H.reshape(F * 6, F * 6)
            Hm = Hm * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
            return cost, g, Hm

        def apply_delta(xs, delta):
            d = delta.reshape(F, 6) * free[:, None]
            return jax.vmap(param.boxplus)(xs, d)

        linear_solve = None
        if cfg.schur_elim is not None:
            import numpy as np

            from ..solvers import schur as schur_mod

            linear_solve = schur_mod.make_schur_solver(
                np.asarray(cfg.schur_elim, bool))

        x0 = jax.vmap(param.from_pose7)(fs_rep.poses)
        xs, _ = lm_mod.lm_solve(x0, build_system, apply_delta, cfg.lm,
                                linear_solve=linear_solve)
        return jax.vmap(param.to_pose7)(xs), uncovered

    poses, uncovered = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(mesh_mod.EDGE_AXIS), P()),
        out_specs=(P(), P()),
        # check_vma=False: the varying-manual-axes checker demands
        # jax.lax.pcast on every scan/while carry initialized from a
        # literal inside the mapped body (e.g. ops/nn.nn_1's running-min
        # carry), but those carries live in shared library code that
        # also runs OUTSIDE shard_map, where pcast is invalid. Numerical
        # parity with the single-device path is asserted instead
        # (tests/test_parallel.py, tests/test_ring.py).
        check_vma=False,
    )(fs, edges, ref_sort)
    return fs.replace(poses=poses), uncovered


@partial(jax.jit, static_argnames=("cfg", "mesh", "point_to_plane",
                                   "e_precision", "outer_rounds",
                                   "inner_iterations", "stagnant_break"))
def sharded_posegraph_round(fs: frameset.FrameSet, edges: jnp.ndarray,
                            cfg: ICPConfig, mesh, ref_sort=None, *,
                            point_to_plane: bool = True,
                            e_precision: float = 0.01,
                            outer_rounds: int = 100,
                            inner_iterations: int = 100,
                            stagnant_break: int = 6):
    """One distributed (correspondence, GICP pose-graph solve) round —
    the g2o comparison solver (icp-g2o.cpp:149-315) under the same
    (edge, point) mesh as :func:`sharded_icp_round`: shared correspondence
    stage, GICP anisotropic information blocks psum-reduced over both
    axes, and the chi2-monitored outer loop (solvers/posegraph.
    chi2_outer_loop) running replicated on the gauge-fixed [6F, 6F]
    system. SURVEY §7.2.9's 'pose-graph solver on the large sharded
    scene' obligation.

    Returns (FrameSet with updated poses (replicated), chi2 history,
    rounds_run, uncovered int32)."""
    from ..solvers import posegraph as pg

    n_edge = mesh.shape[mesh_mod.EDGE_AXIS]
    n_point = mesh.shape[mesh_mod.POINT_AXIS]
    edges = pad_edges(edges, n_edge)
    F = fs.num_frames
    N = fs.num_points
    assert N % n_point == 0, (N, n_point)
    free = (~fs.fixed).astype(fs.points.dtype)
    free6 = jnp.repeat(free, 6)

    def device_fn(fs_rep, edges_loc, rs_rep):
        (idxs, dists, oks, weights, starts, nloc,
         uncovered) = _device_correspondences(fs_rep, edges_loc, cfg, N,
                                              n_point, ref_sort=rs_rep)
        edges_loc = jnp.maximum(edges_loc, 0)   # pad sentinel clamp
        src_idx, dst_idx = edges_loc[:, 0], edges_loc[:, 1]

        if cfg.comm == "blocks":
            src_all = jax.lax.all_gather(
                src_idx, mesh_mod.EDGE_AXIS, tiled=True, axis=0)
            dst_all = jax.lax.all_gather(
                dst_idx, mesh_mod.EDGE_AXIS, tiled=True, axis=0)

        def build_system(xs):
            def edge_terms(e):
                src, dst = src_idx[e], dst_idx[e]
                p = jax.lax.dynamic_slice_in_dim(
                    fs_rep.points[src], starts[e], nloc, axis=0)
                q = fs_rep.points[dst][idxs[e]]
                nrm = fs_rep.normals[dst][idxs[e]]
                x_h, x_k = xs[src], xs[dst]
                r, Jh, Jk = res_mod.residuals_and_jacobians(
                    pg.SE3, "point_to_point", x_h, x_k, p, q, None)
                ng = se3.rotate_only(x_k, nrm)
                return pg._gicp_terms(r, Jh, Jk, ng, e_precision,
                                      oks[e].astype(p.dtype),
                                      point_to_plane)

            cost_e, g_h, g_k, H_hh, H_hk, H_kk = jax.vmap(edge_terms)(
                jnp.arange(edges_loc.shape[0]))
            cost = jax.lax.psum(jnp.sum(cost_e),
                                (mesh_mod.EDGE_AXIS, mesh_mod.POINT_AXIS))
            if cfg.comm == "blocks":
                gh, gk, hhh, hhk, hkk = [
                    jax.lax.all_gather(
                        jax.lax.psum(x, mesh_mod.POINT_AXIS),
                        mesh_mod.EDGE_AXIS, tiled=True, axis=0)
                    for x in (g_h, g_k, H_hh, H_hk, H_kk)]
                G, H = assemble.assemble_dense(
                    F, src_all, dst_all, gh, gk, hhh, hhk, hkk)
            else:
                G, H = assemble.assemble_dense(
                    F, src_idx, dst_idx, g_h, g_k, H_hh, H_hk, H_kk)
                G = jax.lax.psum(G, (mesh_mod.EDGE_AXIS,
                                     mesh_mod.POINT_AXIS))
                H = jax.lax.psum(H, (mesh_mod.EDGE_AXIS,
                                     mesh_mod.POINT_AXIS))
            g = G.reshape(F * 6) * free6
            Hm = H.reshape(F * 6, F * 6)
            Hm = Hm * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
            return cost, g, Hm

        def apply_delta(xs, delta):
            d = delta.reshape(F, 6) * free[:, None]
            return jax.vmap(pg.SE3.boxplus)(xs, d)

        poses, hist, rounds = pg.chi2_outer_loop(
            fs_rep.poses, build_system, apply_delta,
            outer_rounds=outer_rounds, inner_iterations=inner_iterations,
            stagnant_break=stagnant_break)
        return poses, hist, rounds, uncovered

    poses, hist, rounds, uncovered = shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(mesh_mod.EDGE_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        # check_vma=False: the varying-manual-axes checker demands
        # jax.lax.pcast on every scan/while carry initialized from a
        # literal inside the mapped body (e.g. ops/nn.nn_1's running-min
        # carry), but those carries live in shared library code that
        # also runs OUTSIDE shard_map, where pcast is invalid. Numerical
        # parity with the single-device path is asserted instead
        # (tests/test_parallel.py, tests/test_ring.py).
        check_vma=False,
    )(fs, edges, ref_sort)
    return fs.replace(poses=poses), hist, rounds, uncovered


def run_icp_sharded(fs: frameset.FrameSet, cfg: ICPConfig, mesh,
                    rounds: int = None):
    """Distributed outer ICP loop (host-driven)."""
    rounds = cfg.rounds if rounds is None else rounds
    edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
    from ..models.pipeline import _window_cache

    ref_sort = _window_cache(fs, cfg)    # build-index-once, every round
    for i in range(rounds):
        fs, uncovered = sharded_icp_round(fs, edges, cfg, mesh,
                                          ref_sort=ref_sort)
        if cfg.use_window and int(uncovered):
            import warnings

            warnings.warn(
                f"sharded icp round {i}: {int(uncovered)} queries lost "
                f"window coverage (window={cfg.window}); raise cfg.window",
                stacklevel=2)
    return fs
