"""The outer multiview ICP driver: alternate correspondence search and
joint pose solve.

TPU-native replacement for the reference's main loop
(reference: src/main_multiview.cpp:150-169): 20 rounds of
``computeClosestPoints(cutoff)`` then a global Ceres solve, with phase
timing. Two drivers:

- :func:`run_icp` — host loop over the two jitted phases (matches the
  reference structure, allows per-round logging/checkpointing),
- :func:`run_icp_fused` — the whole outer loop as one on-device
  ``lax.fori_loop`` (zero host round-trips; the benchmark path).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

from ..solvers import lm as lm_mod
from ..solvers import multiview as mv_mod
from . import correspond, frameset


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """Mirrors the reference's multiview gflags (main_multiview.cpp:30-51)
    plus framework knobs. SURVEY §5 maps all 19 flags."""

    rounds: int = 20                   # outer loop count (:150)
    knn: int = 2                       # FLAGS_knn
    cutoff: float = 0.05               # FLAGS_cutoff (dmax)
    metric: str = "point_to_plane"     # FLAGS_pointToPlane
    param_name: str = "se3"            # FLAGS_sophusSE3 / angleAxis / quat
    robust: bool = True                # FLAGS_robust
    loss: str = "soft_l1"              # robust family: "soft_l1" (Ceres
    # semantics, reference default) or "soft_l1_norm" (scale-normalized
    # TRF semantics; better on low-overlap scenes — ops/robust.py)
    use_autodiff: bool = False         # FLAGS_sophusSE3_autodiff
    nn_chunk: int = 2048
    use_pallas: bool = False
    use_grid: bool = False
    grid_k: int = 128                  # grid-hash bucket capacity
    use_window: bool = False           # sorted-window sweep (large clouds)
    window: int = 8192                 # sorted-window row count W
    prune: bool = False                # reject dist > 1.5*median matches
    # (the reference's commented-out rejection, frame.cpp:178-183;
    # stabilizes low-overlap scenes — BENCHMARKS.md 'low-overlap drift')
    fixed_src_edges: bool = False      # search edges whose src frame is
    # gauge-fixed (the reference drops them, frame.cpp:93 — losing all
    # gauge anchoring through frame 0's viewpoint; see correspond.py)
    schur_elim: Optional[tuple] = None  # independent-set Schur elimination
    assembly: str = "auto"             # Hessian assembly: "fused" Pallas
    # kernel / "einsum" XLA path / "auto" (fused on TPU when eligible) —
    # kernels/assemble_pallas.py
    pcg_iters: int = 0                 # >0: block-Jacobi PCG linear solve
    # (with schur_elim: ITERATIVE_SCHUR + SCHUR_JACOBI,
    # icp-ceres.cpp:76-80 — solvers/pcg.py)
    pcg_tol: float = 1e-8
    comm: str = "blocks"               # distributed exchange: "blocks"
    # (O(E) per-edge 6x6 blocks through psum/all_gather) or "dense"
    # (psum the O(F^2) system) — see parallel/assemble.py
    lm: lm_mod.LMConfig = lm_mod.LMConfig()


def _window_cache(fs: frameset.FrameSet, cfg: ICPConfig):
    """Per-frame RefSort for the Pallas windowed backend (None for the
    other backends) — computed once per run, reused every round
    (frame.cpp:187-206's build-index-once semantics)."""
    if cfg.use_window and cfg.use_pallas:
        return frameset.sort_cache(fs)
    return None


def icp_round(fs: frameset.FrameSet, edges: jnp.ndarray, cfg: ICPConfig,
              ref_sort=None):
    """One (correspondence, solve) alternation. Returns (fs', corr, stats)."""
    corr = correspond.find_correspondences(
        fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
        use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
        grid_k=cfg.grid_k, use_window=cfg.use_window, window=cfg.window,
        prune=cfg.prune, fixed_src_edges=cfg.fixed_src_edges,
        ref_sort=ref_sort)
    fs, stats = mv_mod.solve_multiview(
        fs, edges, corr, param_name=cfg.param_name, metric=cfg.metric,
        robust=cfg.robust, use_autodiff=cfg.use_autodiff, config=cfg.lm,
        schur_elim=cfg.schur_elim, loss=cfg.loss, assembly=cfg.assembly,
        pcg_iters=cfg.pcg_iters, pcg_tol=cfg.pcg_tol)
    return fs, corr, stats


def enable_schur(cfg: ICPConfig, fs, edges) -> ICPConfig:
    """Return cfg with Schur elimination over a maximal independent set
    of the CONCRETE frame graph (gauge-fixed frames stay kept)."""
    import numpy as np

    from ..solvers import schur as schur_mod

    elim = schur_mod.independent_set(np.asarray(edges), fs.num_frames,
                                     keep=np.asarray(fs.fixed))
    return dataclasses.replace(cfg, schur_elim=tuple(bool(b) for b in elim))


def run_icp(fs: frameset.FrameSet, cfg: ICPConfig = ICPConfig(),
            callback: Optional[Callable] = None):
    """Host-driven outer loop (reference structure, per-round visibility).

    ``callback(round, fs, corr, stats)`` runs after each round (logging,
    checkpointing, export). Returns (fs_final, history list).
    """
    edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
    ref_sort = _window_cache(fs, cfg)
    history: List[dict] = []
    for i in range(cfg.rounds):
        fs, corr, stats = icp_round(fs, edges, cfg, ref_sort=ref_sort)
        uncovered = int(jnp.sum(corr.uncovered))
        if uncovered:
            # poses moved enough that W no longer covers some query tiles
            # (sorted-window backend): those queries were dropped, which
            # silently degrades alignment — be loud about it. Callers can
            # re-run with a larger cfg.window (the CLI auto-raises).
            import warnings

            warnings.warn(
                f"icp round {i}: {uncovered} queries lost window coverage "
                f"(window={cfg.window} too small at current poses); "
                "raise cfg.window", stacklevel=2)
        entry = dict(
            round=i,
            lm_iterations=int(stats.iterations),
            cost=float(stats.final_cost),
            matched=int(jnp.sum(corr.valid)),
            uncovered=uncovered,
            termination=lm_mod.reason_str(stats),
        )
        history.append(entry)
        if callback is not None:
            callback(i, fs, corr, stats)
    return fs, history


@jax.jit
def window_need(fs: frameset.FrameSet, edges: jnp.ndarray, cutoff: float):
    """Max sorted-window rows any edge's query tiles span at fs.poses —
    the W the sorted-window backend needs for full coverage of this data
    right now. One fused program over all edges (vmap), not a host loop
    with per-edge dispatch."""
    from ..ops import nn_window, se3

    def per_edge(edge):
        s, d = edge[0], edge[1]
        rel = se3.compose(se3.inverse(fs.poses[d]), fs.poses[s])
        q = se3.apply(rel, fs.points[s])
        return nn_window.window_shortfall(
            q, fs.points[d], fs.valid[d], cutoff, query_valid=fs.valid[s])

    return jnp.max(jax.vmap(per_edge)(edges))


def autoraise_window(cfg: ICPConfig, fs: frameset.FrameSet,
                     edges: jnp.ndarray, floor: int = 0,
                     quiet: bool = False) -> ICPConfig:
    """Return cfg with window W >= what the data needs at fs.poses
    (rounded up to the 2048-row tile granularity plus one tile margin)."""
    if not cfg.use_window:
        return cfg
    need = max(floor, int(window_need(fs, edges, cfg.cutoff)))
    need = -(-(need + 2048) // 2048) * 2048   # tile granularity + margin
    if cfg.window < need:
        if not quiet:
            print(f"--window {cfg.window} cannot cover every query tile "
                  f"on this data (needs ~{need}); raising to {need}")
        cfg = dataclasses.replace(cfg, window=need)
    return cfg


@partial(jax.jit, static_argnames=("cfg",))
def run_icp_fused(fs: frameset.FrameSet, cfg: ICPConfig = ICPConfig()):
    """The full outer ICP loop as one compiled program.

    The graph is built once from the initial poses (the reference also
    builds it once before the loop, main_multiview.cpp:142). Returns
    (fs_final, per-round cost array, per-round uncovered-query counts —
    nonzero entries mean the sorted-window backend lost coverage that
    round and cfg.window must be raised; always 0 on other backends).
    """
    edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
    ref_sort = _window_cache(fs, cfg)   # once, outside the round loop

    def body(i, carry):
        fs, costs, unc = carry
        fs, corr, stats = icp_round(fs, edges, cfg, ref_sort=ref_sort)
        return (fs, costs.at[i].set(stats.final_cost),
                unc.at[i].set(jnp.sum(corr.uncovered).astype(jnp.int32)))

    costs0 = jnp.zeros(cfg.rounds, dtype=fs.points.dtype)
    unc0 = jnp.zeros(cfg.rounds, dtype=jnp.int32)
    fs, costs, unc = jax.lax.fori_loop(0, cfg.rounds, body,
                                       (fs, costs0, unc0))
    return fs, costs, unc


@partial(jax.jit, static_argnames=("cfg", "e_precision", "outer_rounds",
                                   "inner_iterations", "stagnant_break"))
def run_gicp_fused(fs: frameset.FrameSet, cfg: ICPConfig = ICPConfig(), *,
                   e_precision: float = 0.01, outer_rounds: int = 100,
                   inner_iterations: int = 100, stagnant_break: int = 6,
                   rel_improvement: float = 1e-6):
    """The g2o comparison path (icp-g2o.cpp g2oOptimizer inside the
    main_multiview.cpp:150-169 outer loop) as ONE compiled program:
    ``cfg.rounds`` alternations of correspondence search and the
    chi2-monitored GICP pose-graph solve, zero host round-trips.

    The point-to-plane/point-to-point switch follows ``cfg.metric``; the
    GICP information matrix is W = nn^T + e(I - nn^T) with ``e_precision``
    (g2o EdgeGICP::prec0, icp-g2o.cpp:119-129).

    Returns (fs_final, per-round final chi2 [rounds], per-round
    uncovered-query counts — see run_icp_fused).
    """
    from ..solvers import posegraph as pg

    edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
    p2pl = cfg.metric == "point_to_plane"
    ref_sort = _window_cache(fs, cfg)   # once, outside the round loop

    def body(i, carry):
        fs, chis, unc = carry
        corr = correspond.find_correspondences(
            fs, edges, cfg.cutoff, chunk=cfg.nn_chunk,
            use_pallas=cfg.use_pallas, use_grid=cfg.use_grid,
            grid_k=cfg.grid_k, use_window=cfg.use_window, window=cfg.window,
            prune=cfg.prune, fixed_src_edges=cfg.fixed_src_edges,
            ref_sort=ref_sort)
        build_system, apply_delta = pg._posegraph_system(
            fs, edges, corr, p2pl, e_precision, assembly=cfg.assembly)
        poses, hist, rounds = pg.chi2_outer_loop(
            fs.poses, build_system, apply_delta, outer_rounds=outer_rounds,
            inner_iterations=inner_iterations, stagnant_break=stagnant_break,
            rel_improvement=rel_improvement)
        chi2 = hist[jnp.maximum(rounds - 1, 0)]
        return (fs.replace(poses=poses), chis.at[i].set(chi2),
                unc.at[i].set(jnp.sum(corr.uncovered).astype(jnp.int32)))

    chis0 = jnp.zeros(cfg.rounds, dtype=fs.points.dtype)
    unc0 = jnp.zeros(cfg.rounds, dtype=jnp.int32)
    fs, chis, unc = jax.lax.fori_loop(0, cfg.rounds, body, (fs, chis0, unc0))
    return fs, chis, unc


def _run_fused_checked(runner, fs0: frameset.FrameSet, cfg: ICPConfig,
                       max_retries: int, **kw):
    """Coverage-safe fused driver: run the fused program; if the
    sorted-window backend lost coverage mid-run (uncovered > 0 — those
    correspondences were silently dropped, so the whole run is degraded,
    frame.cpp:156-160's every-point-gets-its-true-NN contract broken),
    re-size W at the drifted poses and RE-RUN from the original poses
    instead of returning the degraded result. Raises RuntimeError if W
    still cannot cover after ``max_retries`` re-sizes."""
    edges = None
    for _ in range(max_retries + 1):
        fs, series, unc = runner(fs0, cfg, **kw)
        if not cfg.use_window or not bool(jnp.any(unc > 0)):
            return fs, series, unc, cfg
        if edges is None:
            edges = frameset.knn_pose_graph(fs0.poses, cfg.knn)
        import warnings

        warnings.warn(
            f"fused run lost window coverage "
            f"(max {int(jnp.max(unc))} queries/round at window="
            f"{cfg.window}); re-sizing W and re-running", stacklevel=3)
        # size W against BOTH the start and the drifted end poses, plus a
        # tile of slack for the trajectory in between
        cfg = autoraise_window(cfg, fs0, edges, floor=cfg.window + 2048,
                               quiet=True)
        cfg = autoraise_window(cfg, fs, edges, floor=cfg.window,
                               quiet=True)
    raise RuntimeError(
        f"window coverage still lost after {max_retries} re-sizes "
        f"(window={cfg.window}); use the host-driven loop (run_icp) or a "
        "non-window NN backend for this data")


def run_icp_fused_checked(fs: frameset.FrameSet,
                          cfg: ICPConfig = ICPConfig(),
                          max_retries: int = 2):
    """:func:`run_icp_fused` with the window-coverage guarantee restored.

    Returns (fs_final, per-round costs, per-round uncovered (all zero on
    success), the cfg actually used — its window may have been raised)."""
    return _run_fused_checked(run_icp_fused, fs, cfg, max_retries)


def run_gicp_fused_checked(fs: frameset.FrameSet,
                           cfg: ICPConfig = ICPConfig(),
                           max_retries: int = 2, **kw):
    """:func:`run_gicp_fused` with the window-coverage guarantee restored
    (same contract as :func:`run_icp_fused_checked`)."""
    return _run_fused_checked(run_gicp_fused, fs, cfg, max_retries, **kw)
