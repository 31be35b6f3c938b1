"""GICP-style pose-graph solver — the reference's g2o comparison path.

TPU-native replacement for src/internal/icp-g2o.cpp: one SE3 vertex per
frame, one GICP edge per correspondence, Levenberg-Marquardt with
anisotropic per-correspondence information matrices, and the chi2-monitored
outer loop.

Information-matrix semantics (g2o ``EdgeGICP::prec0(0.01)``,
icp-g2o.cpp:119-129): ``makeRot0`` puts the measurement normal in row 2 of
R0, and ``prec0(e) = R0^T diag(e, e, 1) R0``, which is exactly

    W = n n^T + e (I - n n^T)

— precision 1 along the surface normal, ``e`` = 0.01 in the tangent plane.
g2o evaluates the error in the destination vertex frame; in our
global-frame residual r = g_h(p) - g_k(q) the congruent information is
W_g = R_k W_local R_k^T, i.e. the same formula with the *rotated* normal.
Point-to-point mode uses identity information (icp-g2o.cpp:67).

The weighted normal equations exploit the rank-1 + scaled-identity
structure: J^T W J = e J^T J + (1-e) (J^T n)(n^T J) — no 3x3 products per
correspondence.

Outer loop (multiview, icp-g2o.cpp:261-303): up to 100 rounds of an inner
LM solve (<=100 iterations), tracking relative chi2 improvement and
breaking after 6 rounds without improvement (the reference's log message
says "100 times no impr." but the counter trips at 6 — SURVEY §7.4).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.correspond import Correspondences
from ..models.frameset import FrameSet
from ..ops import residuals as res_mod
from ..ops import se3
from . import lm as lm_mod

_HI = jax.lax.Precision.HIGHEST
SE3 = res_mod.SE3


def _gicp_terms(r, Jh, Jk, ng, e_prec, wmask, point_to_plane):
    """Per-edge cost/grad/Hessian blocks under W = nn^T + e(I-nn^T).

    r (N,3), J* (N,3,6), ng (N,3) rotated dst normals, wmask (N,).
    """
    if point_to_plane:
        rn = jnp.sum(r * ng, axis=-1)                      # n.r
        Wr = e_prec * r + (1.0 - e_prec) * rn[:, None] * ng
        chi = jnp.sum(r * Wr, axis=-1)
        Jh_n = jnp.einsum("ni,nij->nj", ng, Jh, precision=_HI)
        Jk_n = jnp.einsum("ni,nij->nj", ng, Jk, precision=_HI)

        def HtWJ(Ja, Jna, Jb, Jnb):
            full = jnp.einsum("nij,n,nik->jk", Ja, wmask, Jb, precision=_HI)
            rank1 = jnp.einsum("nj,n,nk->jk", Jna, wmask, Jnb,
                               precision=_HI)
            return e_prec * full + (1.0 - e_prec) * rank1

        g_h = jnp.einsum("nij,ni->j", Jh, wmask[:, None] * Wr,
                         precision=_HI)
        g_k = jnp.einsum("nij,ni->j", Jk, wmask[:, None] * Wr,
                         precision=_HI)
        H_hh = HtWJ(Jh, Jh_n, Jh, Jh_n)
        H_hk = HtWJ(Jh, Jh_n, Jk, Jk_n)
        H_kk = HtWJ(Jk, Jk_n, Jk, Jk_n)
    else:
        Wr = r
        chi = jnp.sum(r * r, axis=-1)
        g_h = jnp.einsum("nij,ni->j", Jh, wmask[:, None] * Wr,
                         precision=_HI)
        g_k = jnp.einsum("nij,ni->j", Jk, wmask[:, None] * Wr,
                         precision=_HI)
        H_hh = jnp.einsum("nij,n,nik->jk", Jh, wmask, Jh, precision=_HI)
        H_hk = jnp.einsum("nij,n,nik->jk", Jh, wmask, Jk, precision=_HI)
        H_kk = jnp.einsum("nij,n,nik->jk", Jk, wmask, Jk, precision=_HI)
    cost = 0.5 * jnp.sum(chi * wmask)
    return cost, g_h, g_k, H_hh, H_hk, H_kk


def _posegraph_system(fs: FrameSet, edges: jnp.ndarray,
                      corr: Correspondences, point_to_plane: bool,
                      e_precision: float, vectorize_edges: bool = True,
                      assembly: str = "auto"):
    """(build_system, apply_delta) closures over the GICP edge set.

    ``assembly`` selects the einsum contraction or the fused Pallas
    Gram-accumulation kernel (kernels/assemble_pallas.py, gicp modes)."""
    F = fs.num_frames
    free = (~fs.fixed).astype(fs.points.dtype)
    free6 = jnp.repeat(free, 6)
    src_idx, dst_idx = edges[:, 0], edges[:, 1]
    p_e = fs.points[src_idx]
    # one 6-wide gather for points+normals (see multiview.py)
    pn = jnp.concatenate([fs.points, fs.normals], axis=-1)
    qn_e = jnp.take_along_axis(pn[dst_idx], corr.nn_idx[..., None],
                               axis=1)
    q_e = qn_e[..., :3]
    n_e = qn_e[..., 3:]
    vmask = corr.valid.astype(fs.points.dtype)

    from ..kernels import assemble_pallas as ap

    fused = ap.resolve_assembly(assembly, "se3", False, fs.points.dtype)

    def finish(cost_e, g_h, g_k, H_hh, H_hk, H_kk):
        cost = jnp.sum(cost_e)
        from ..parallel import assemble

        G, H = assemble.assemble_dense(
            F, src_idx, dst_idx, g_h, g_k, H_hh, H_hk, H_kk)
        g = G.reshape(F * 6) * free6
        Hm = H.reshape(F * 6, F * 6)
        Hm = Hm * free6[:, None] * free6[None, :] + jnp.diag(1.0 - free6)
        return cost, g, Hm

    def apply_delta(xs, delta):
        d = delta.reshape(F, 6) * free[:, None]
        return jax.vmap(SE3.boxplus)(xs, d)

    if fused:
        packed = ap.pack_edges(p_e, q_e, n_e, vmask)
        mode = "gicp_p2pl" if point_to_plane else "gicp_p2pt"

        def build_system_fused(xs):
            R, t = jax.vmap(se3.to_Rt)(xs)
            scal = ap.pack_scalars(R[src_idx], t[src_idx],
                                   R[dst_idx], t[dst_idx],
                                   eprec=e_precision)
            terms = ap.system_terms(packed, scal, mode=mode,
                                    loss="trivial")
            return finish(*terms)

        return build_system_fused, apply_delta

    def build_system(xs):
        def edge_terms(e):
            x_h, x_k = xs[src_idx[e]], xs[dst_idx[e]]
            r, Jh, Jk = res_mod.residuals_and_jacobians(
                SE3, "point_to_point", x_h, x_k, p_e[e], q_e[e], None)
            ng = se3.rotate_only(x_k, n_e[e])
            return _gicp_terms(r, Jh, Jk, ng, e_precision, vmask[e],
                               point_to_plane)

        # vmap batches the per-edge einsums into single MXU contractions
        # (the LM path's vectorize_edges pattern, multiview.py); lax.map
        # is the low-memory fallback for very large edge counts.
        if vectorize_edges:
            cost_e, g_h, g_k, H_hh, H_hk, H_kk = jax.vmap(edge_terms)(
                jnp.arange(edges.shape[0]))
        else:
            cost_e, g_h, g_k, H_hh, H_hk, H_kk = jax.lax.map(
                edge_terms, jnp.arange(edges.shape[0]))
        return finish(cost_e, g_h, g_k, H_hh, H_hk, H_kk)

    return build_system, apply_delta


def chi2_outer_loop(poses, build_system, apply_delta, *,
                    outer_rounds: int = 100, inner_iterations: int = 100,
                    stagnant_break: int = 6, rel_improvement: float = 1e-6):
    """The g2o chi2-monitored outer loop (icp-g2o.cpp:261-303) as one
    ``lax.while_loop`` over inner LM solves, over ANY build_system —
    single-device (:func:`solve_posegraph_fused`) or a shard_map'd one
    with psum'd normal equations (parallel/sharded.sharded_posegraph_round).

    The trust-region state (radius, decrease factor) is CARRIED across
    inner solves — g2o's SparseOptimizer keeps its LM lambda between
    consecutive ``optimize(100)`` calls, so each inner solve continues
    where the last stopped. This is also what makes the stagnant rounds
    the break counter needs nearly free: once an inner solve converges
    its radius has collapsed, and the re-solves terminate after a single
    system evaluation instead of re-running a rejection cascade from a
    fresh radius (measured 7x inner-solve count -> ~1.1x on Bunny).

    Two further g2o-faithful short-circuits:
    - inner solves stop after 10 consecutive rejected step trials
      (OptimizationAlgorithmLevenberg::_maxTrialsAfterFailure = 10, the
      same cut g2o's optimize() applies);
    - if an inner solve returns the poses BIT-UNCHANGED, the loop breaks
      immediately: the solve is a deterministic pure function of (poses,
      trust-region state), poses only stay bit-identical when every step
      trial was rejected, and re-running from the same point with an even
      smaller trust region can at most re-accept a float-noise step — the
      remaining stagnant rounds the break counter would count are no-ops
      up to float noise at an already rejected-out optimum.

    Returns (poses', chi2 history [outer_rounds] — NaN past the break,
    rounds_run int32)."""
    cfg = lm_mod.LMConfig(max_iterations=inner_iterations,
                          max_consecutive_rejections=10)
    dtype = poses.dtype

    def inner(p, tr):
        xs, stats = lm_mod.lm_solve(p, build_system, apply_delta, cfg,
                                    tr_state=tr)
        return xs, 2.0 * stats.final_cost, (stats.radius,
                                            stats.decrease_factor)

    def cond(carry):
        _, _, stagnant, i, _, _ = carry
        return jnp.logical_and(i < outer_rounds,
                               stagnant < stagnant_break)

    def body(carry):
        poses, last, stagnant, i, hist, tr = carry
        new_poses, chi2, tr = inner(poses, tr)
        fixedpoint = jnp.all(new_poses == poses)
        impr = (last - chi2) / jnp.maximum(last, 1e-30)
        first = ~jnp.isfinite(last)
        # cumulative counter, g2o-faithful: the reference increments
        # noImpr on every non-improving round and NEVER resets it
        # (icp-g2o.cpp:285-297 'noImpr++' with no reset branch), breaking
        # once 6 such rounds have accumulated — improving rounds leave
        # the count unchanged rather than clearing it
        stagnant = jnp.where(
            jnp.logical_or(first, impr > rel_improvement),
            stagnant, stagnant + 1)
        stagnant = jnp.where(fixedpoint, stagnant_break, stagnant)
        return (new_poses, chi2, stagnant, i + 1, hist.at[i].set(chi2), tr)

    hist0 = jnp.full(outer_rounds, jnp.nan, dtype)
    tr0 = (jnp.asarray(cfg.initial_radius, dtype), jnp.asarray(2.0, dtype))
    poses, _, _, rounds, hist, _ = jax.lax.while_loop(
        cond, body,
        (poses, jnp.asarray(jnp.inf, dtype), jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32), hist0, tr0))
    return poses, hist, rounds


@partial(jax.jit, static_argnames=("point_to_plane", "config",
                                   "assembly"))
def solve_posegraph_once(fs: FrameSet, edges: jnp.ndarray,
                         corr: Correspondences, *,
                         point_to_plane: bool = True,
                         e_precision: float = 0.01,
                         config: lm_mod.LMConfig = lm_mod.LMConfig(
                             max_iterations=100,
                             max_consecutive_rejections=10),
                         tr_state=None, assembly: str = "auto"):
    """One inner LM solve of the pose graph (g2oOptimizer body,
    icp-g2o.cpp:176-259). ``tr_state`` continues a previous solve's trust
    region (g2o optimize() continuation — see chi2_outer_loop).
    Returns (FrameSet', chi2, LMStats)."""
    build_system, apply_delta = _posegraph_system(
        fs, edges, corr, point_to_plane, e_precision, assembly=assembly)
    xs, stats = lm_mod.lm_solve(fs.poses, build_system, apply_delta, config,
                                tr_state=tr_state)
    return fs.replace(poses=xs), 2.0 * stats.final_cost, stats


@partial(jax.jit, static_argnames=("point_to_plane", "outer_rounds",
                                   "inner_iterations", "stagnant_break",
                                   "assembly"))
def solve_posegraph_fused(fs: FrameSet, edges: jnp.ndarray,
                          corr: Correspondences, *,
                          point_to_plane: bool = True,
                          e_precision: float = 0.01,
                          outer_rounds: int = 100,
                          inner_iterations: int = 100,
                          stagnant_break: int = 6,
                          rel_improvement: float = 1e-6,
                          assembly: str = "auto"):
    """The whole chi2-monitored outer loop (icp-g2o.cpp:261-303) as ONE
    compiled program: a ``lax.while_loop`` over inner LM solves, tracking
    relative chi2 improvement and breaking after ``stagnant_break``
    non-improving rounds — no host round-trip per round (the host-driven
    :func:`solve_posegraph` syncs a float per round, measured 5x slower
    than the LM path at Bunny scale).

    Returns (FrameSet', chi2 history [outer_rounds] — entries past the
    break carry NaN, rounds_run int32).
    """
    build_system, apply_delta = _posegraph_system(
        fs, edges, corr, point_to_plane, e_precision, assembly=assembly)
    poses, hist, rounds = chi2_outer_loop(
        fs.poses, build_system, apply_delta, outer_rounds=outer_rounds,
        inner_iterations=inner_iterations, stagnant_break=stagnant_break,
        rel_improvement=rel_improvement)
    return fs.replace(poses=poses), hist, rounds


def solve_posegraph(fs: FrameSet, edges: jnp.ndarray, corr: Correspondences,
                    *, point_to_plane: bool = True,
                    e_precision: float = 0.01, outer_rounds: int = 100,
                    inner_iterations: int = 100, stagnant_break: int = 6,
                    rel_improvement: float = 1e-6, verbose: bool = False):
    """chi2-monitored pose-graph optimization (g2oOptimizer outer loop,
    icp-g2o.cpp:261-303), host-driven variant of
    :func:`solve_posegraph_fused` with identical semantics (trust-region
    continuation across inner solves, fixed-point break — see
    chi2_outer_loop). Returns (FrameSet', chi2 history)."""
    cfg = lm_mod.LMConfig(max_iterations=inner_iterations,
                          max_consecutive_rejections=10)
    history = []
    last = None
    stagnant = 0
    tr = None
    for _ in range(outer_rounds):
        prev_poses = fs.poses
        fs, chi2, stats = solve_posegraph_once(
            fs, edges, corr, point_to_plane=point_to_plane,
            e_precision=e_precision, config=cfg, tr_state=tr)
        tr = (stats.radius, stats.decrease_factor)
        chi2 = float(chi2)
        history.append(chi2)
        if verbose:
            print(f"posegraph chi2: {chi2:.6g}  {lm_mod.report(stats)}")
        if bool(jnp.all(fs.poses == prev_poses)):
            break
        if last is not None:
            impr = (last - chi2) / max(last, 1e-30)
            stagnant = 0 if impr > rel_improvement else stagnant + 1
            if stagnant >= stagnant_break:
                break
        last = chi2
    return fs, history


@partial(jax.jit, static_argnames=("point_to_plane", "config"))
def solve_pairwise_gicp(src, dst, nor=None, *, point_to_plane: bool = False,
                        e_precision: float = 0.01,
                        config: lm_mod.LMConfig = lm_mod.LMConfig(
                            max_iterations=300)):
    """Pairwise g2o equivalent (ICP_G2O::pointToPoint / pointToPlane,
    icp-g2o.cpp:26-147): dst vertex fixed at identity, src vertex solved
    with GICP information, <=300 LM iterations. Returns (pose7, stats)."""
    x_id = jnp.zeros(7, src.dtype).at[3].set(1.0)
    if nor is None:
        nor = jnp.zeros_like(src)
    wmask = jnp.ones(src.shape[0], src.dtype)

    def build_system(x):
        r, Jh, _ = res_mod.residuals_and_jacobians(
            SE3, "point_to_point", x, x_id, src, dst, None)
        cost, g_h, _, H_hh, _, _ = _gicp_terms(
            r, Jh, jnp.zeros_like(Jh), nor, e_precision, wmask,
            point_to_plane)
        return cost, g_h, H_hh

    x, stats = lm_mod.lm_solve(x_id, build_system, SE3.boxplus, config)
    return x, stats
