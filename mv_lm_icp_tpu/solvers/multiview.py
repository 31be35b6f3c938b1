"""Joint multiview pose optimization: blocked Gauss-Newton normal equations
over the frame graph, solved by the on-device LM core.

TPU-native replacement for the reference's multiview Ceres optimizers
(reference: src/internal/icp-ceres.cpp:220-475 ``ceresOptimizer``,
``ceresOptimizer_ceresAngleAxis``, ``ceresOptimizer_sophusSE3``): minimizes

  E(g_1..g_M) = sum_h sum_k A(h,k) sum_i rho(|d(g_h p_i, g_k q_i)|^2)

(docs/mv-lm-icp.tex:84-87) over all absolute poses jointly. Where Ceres
builds residual-block objects and factorizes a sparse system
(SPARSE_NORMAL_CHOLESKY, icp-ceres.cpp:66-89), here each edge's
correspondence array contributes four dense 6x6 blocks
(H_hh, H_hk, H_kh, H_kk) and two 6-gradients computed as batched einsums,
scatter-added into the dense [6F, 6F] system — for frame counts in the
hundreds this dense Cholesky is faster on TPU than any sparse structure.

Gauge fixing: fixed frames' rows/columns are eliminated exactly — zeroed
on both sides with an identity diagonal — which is algebraically identical
to dropping them (delta_fixed = 0, no coupling), the well-conditioned
version of Ceres' SetParameterBlockConstant (icp-ceres.cpp:306-312,
SURVEY §7.3.5). The robust SoftL1 loss uses the per-edge scale
``corr.weight`` exactly like icp-ceres.cpp:283-284.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.correspond import Correspondences
from ..models.frameset import FrameSet
from ..ops import residuals as res_mod
from ..ops import robust as robust_mod
from ..ops.se3 import to_Rt as se3_to_Rt
from . import lm as lm_mod

_HI = jax.lax.Precision.HIGHEST


def make_multiview_system(param, metric: str, fs: FrameSet,
                          edges: jnp.ndarray, corr: Correspondences,
                          robust: bool, use_autodiff: bool = False,
                          vectorize_edges: bool = True,
                          loss: str = "soft_l1", assembly: str = "auto"):
    """Returns build_system(xs[F, ambient]) -> (cost, g[6F], H[6F, 6F]).

    ``loss`` selects the robust loss family when ``robust`` is on:
    "soft_l1" (Ceres semantics, the reference default) or "soft_l1_norm"
    (scale-normalized TRF semantics — see ops/robust.soft_l1_norm).

    ``assembly``: "einsum" (batched-einsum contraction of the stacked
    system matrix), "fused" (the Pallas kernel that streams the inputs
    once and accumulates the 13x13 Gram blocks in VMEM —
    kernels/assemble_pallas.py), or "auto" (fused on TPU for the eligible
    se3/f32/analytic configurations, einsum otherwise)."""
    F = fs.num_frames
    jac_fn = (res_mod.residuals_and_jacobians_autodiff if use_autodiff
              else res_mod.residuals_and_jacobians)
    loss_fn = robust_mod.LOSSES[loss] if robust else robust_mod.trivial
    free = (~fs.fixed).astype(fs.points.dtype)            # [F]
    free6 = jnp.repeat(free, 6)                           # [6F]

    # Per-edge gathered constants (E, N, 3); gathers happen once at
    # trace. Points and normals gather as ONE 6-wide row fetch: TPU
    # gather cost is per row, so one (N, 6) gather beats two (N, 3)s
    # (measured in the fused-round budget, BENCHMARKS round 5).
    src_idx, dst_idx = edges[:, 0], edges[:, 1]
    p_e = fs.points[src_idx]                              # (E, N, 3)
    pn = jnp.concatenate([fs.points, fs.normals], axis=-1)   # (F, N, 6)
    qn_e = jnp.take_along_axis(
        pn[dst_idx], corr.nn_idx[..., None], axis=1)      # (E, N, 6)
    q_e = qn_e[..., :3]
    n_e = qn_e[..., 3:]
    vmask = corr.valid.astype(fs.points.dtype)            # (E, N)
    scale = corr.weight[:, None]                          # (E, 1)

    from ..kernels import assemble_pallas as ap

    fused = ap.resolve_assembly(assembly, param.name, use_autodiff,
                                fs.points.dtype)

    def finish(xs_unused, cost_e, g_h, g_k, H_hh, H_hk, H_kk):
        cost = jnp.sum(cost_e)
        from ..parallel import assemble

        G, H = assemble.assemble_dense(
            F, src_idx, dst_idx, g_h, g_k, H_hh, H_hk, H_kk)
        g = G.reshape(F * 6) * free6
        Hm = H.reshape(F * 6, F * 6)
        Hm = Hm * free6[:, None] * free6[None, :]
        Hm = Hm + jnp.diag(1.0 - free6)
        return cost, g, Hm

    if fused:
        packed = ap.pack_edges(p_e, q_e, n_e, vmask)
        mode = ("lm_p2pl" if metric == "point_to_plane" else "lm_p2pt")
        kloss = loss if robust else "trivial"

        def build_system_fused(xs):
            x7 = jax.vmap(param.to_pose7)(xs)
            R, t = jax.vmap(se3_to_Rt)(x7)
            scal = ap.pack_scalars(R[src_idx], t[src_idx],
                                   R[dst_idx], t[dst_idx], corr.weight)
            terms = ap.system_terms(packed, scal, mode=mode, loss=kloss)
            return finish(xs, *terms)

        return build_system_fused

    def build_system(xs):
        def edge_terms(e):
            x_h = xs[src_idx[e]]
            x_k = xs[dst_idx[e]]
            r, Jh, Jk = jac_fn(param, metric, x_h, x_k,
                               p_e[e], q_e[e], n_e[e])
            if metric == "point_to_point":
                s = jnp.sum(r * r, axis=-1)
            else:
                s = r * r
            rho, w = loss_fn(s, scale[e])
            w = w * vmask[e]
            cost_e = 0.5 * jnp.sum(rho * vmask[e])
            if metric == "point_to_point":
                g_h = jnp.einsum("nij,ni->j", Jh, w[:, None] * r,
                                 precision=_HI)
                g_k = jnp.einsum("nij,ni->j", Jk, w[:, None] * r,
                                 precision=_HI)
                H_hh = jnp.einsum("nij,n,nik->jk", Jh, w, Jh, precision=_HI)
                H_hk = jnp.einsum("nij,n,nik->jk", Jh, w, Jk, precision=_HI)
                H_kk = jnp.einsum("nij,n,nik->jk", Jk, w, Jk, precision=_HI)
            else:
                return res_mod.p2pl_system_terms(r, Jh, Jk, w, rho,
                                                 vmask[e])
            return cost_e, g_h, g_k, H_hh, H_hk, H_kk

        # vmap turns the per-edge einsums into single batched MXU ops;
        # lax.map is the low-memory fallback for very large edge counts
        if vectorize_edges:
            terms = jax.vmap(edge_terms)(jnp.arange(edges.shape[0]))
        else:
            terms = jax.lax.map(edge_terms, jnp.arange(edges.shape[0]))
        return finish(xs, *terms)

    return build_system


@partial(jax.jit, static_argnames=("param_name", "metric", "robust",
                                   "use_autodiff", "config",
                                   "vectorize_edges", "schur_elim",
                                   "loss", "assembly", "pcg_iters",
                                   "pcg_tol"))
def solve_multiview(fs: FrameSet, edges: jnp.ndarray, corr: Correspondences,
                    *, param_name: str = "se3",
                    metric: str = "point_to_plane", robust: bool = True,
                    use_autodiff: bool = False,
                    config: lm_mod.LMConfig = lm_mod.LMConfig(),
                    vectorize_edges: bool = True,
                    schur_elim: tuple = None, loss: str = "soft_l1",
                    assembly: str = "auto", pcg_iters: int = 0,
                    pcg_tol: float = 1e-8):
    """One joint LM solve over all frame poses with fixed correspondences.

    The equivalent of one ceresOptimizer_* call in the outer ICP loop
    (main_multiview.cpp:158-164). Returns (FrameSet with updated poses,
    LMStats).

    ``schur_elim``: optional length-F bool tuple (static) marking an
    independent set of frames to eliminate by Schur complement before
    the dense factorization (solvers/schur.py — the equivalent of Ceres'
    use_explicit_schur_complement, icp-ceres.cpp:77). Build it with
    ``schur.independent_set(edges, F, keep=fixed)``.

    ``pcg_iters`` > 0 replaces the dense Cholesky with block-Jacobi
    preconditioned CG (solvers/pcg.py); combined with ``schur_elim`` it
    runs CG on the exactly-reduced system — the reference's
    ITERATIVE_SCHUR + SCHUR_JACOBI configuration (icp-ceres.cpp:76-80).
    """
    param = res_mod.PARAMS[param_name]
    free = (~fs.fixed).astype(fs.points.dtype)
    x0 = jax.vmap(param.from_pose7)(fs.poses)
    system = make_multiview_system(param, metric, fs, edges, corr, robust,
                                   use_autodiff, vectorize_edges, loss,
                                   assembly)
    linear_solve = None
    if pcg_iters > 0:
        import numpy as np

        from . import pcg as pcg_mod

        elim = (np.asarray(schur_elim, bool)
                if schur_elim is not None else None)
        linear_solve = pcg_mod.make_pcg_solver(
            tol=pcg_tol, maxiter=pcg_iters, elim=elim)
    elif schur_elim is not None:
        import numpy as np

        from . import schur as schur_mod

        linear_solve = schur_mod.make_schur_solver(
            np.asarray(schur_elim, bool))

    def apply_delta(xs, delta):
        d = delta.reshape(fs.num_frames, 6) * free[:, None]
        return jax.vmap(param.boxplus)(xs, d)

    xs, stats = lm_mod.lm_solve(x0, system, apply_delta, config,
                                linear_solve=linear_solve)
    poses = jax.vmap(param.to_pose7)(xs)
    return fs.replace(poses=poses), stats
