"""On-device Levenberg-Marquardt: trust-region loop in ``lax.while_loop``.

TPU-native replacement for the Ceres solver core used throughout the
reference (reference: src/internal/icp-ceres.cpp:45-95 ``getOptions`` /
``solve``): Levenberg-Marquardt with a trust-region radius, Jacobi
diagonal damping, step-quality accept/reject, and Ceres' default
convergence criteria (function/gradient/parameter tolerances, <= 50
iterations). Where Ceres assembles a sparse problem from residual-block
objects and factorizes with DENSE_QR / SPARSE_NORMAL_CHOLESKY, here the
caller supplies one fused ``build_system`` function returning
(cost, gradient, Gauss-Newton Hessian) over a fixed tangent space — dense
6-dim for pairwise, dense 6F-dim (gauge-fixed) for multiview — and the
damped system is solved with a Cholesky factorization on device.

The whole solve — residual evaluation, normal equations, damping, step
control — is a single jitted while_loop: no host round-trips per
iteration, which is where the >=10x-vs-CPU-Ceres throughput target
(BASELINE.json) comes from.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import residuals as res_mod
from ..ops import robust as robust_mod

_HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Mirrors the Ceres Solver::Options defaults the reference relies on
    (max_num_iterations set explicitly to 50, icp-ceres.cpp:51,81)."""

    max_iterations: int = 50
    function_tolerance: float = 1e-6        # Ceres default
    gradient_tolerance: float = 1e-10       # Ceres default
    parameter_tolerance: float = 1e-8       # Ceres default
    initial_radius: float = 1e4             # Ceres initial_trust_region_radius
    max_radius: float = 1e16
    min_diagonal: float = 1e-6              # Ceres lm_min_diagonal
    max_diagonal: float = 1e32              # Ceres lm_max_diagonal
    min_relative_decrease: float = 1e-3     # Ceres default
    # stop after this many CONSECUTIVE rejected steps (0 = disabled).
    # Ceres has no such cut, but g2o does: OptimizationAlgorithmLevenberg
    # ::_maxTrialsAfterFailure = 10 ends an optimize() call once 10 step
    # trials in a row fail — the GICP pose-graph path (solvers/posegraph)
    # sets 10 to match, which spares the ~15-step radius-collapse cascade
    # a converged solve otherwise pays.
    max_consecutive_rejections: int = 0


class LMState(NamedTuple):
    x: jnp.ndarray
    radius: jnp.ndarray
    decrease_factor: jnp.ndarray
    cost: jnp.ndarray
    grad: jnp.ndarray
    hess: jnp.ndarray
    iteration: jnp.ndarray
    done: jnp.ndarray
    converged: jnp.ndarray
    reason: jnp.ndarray
    rejections: jnp.ndarray


# Termination reason codes (LMStats.reason) — the information Ceres'
# FullReport() prints per solve ("Termination: CONVERGENCE ...",
# icp-ceres.cpp:91-95). Index into TERMINATION_REASONS for the name.
REASON_MAX_ITERATIONS = 0      # budget exhausted, not converged
REASON_FUNCTION_TOLERANCE = 1  # |Δcost| <= ftol * cost
REASON_GRADIENT_TOLERANCE = 2  # max|g| <= gtol
REASON_PARAMETER_TOLERANCE = 3  # |step| <= xtol * (|x| + xtol)
REASON_RADIUS_COLLAPSED = 4    # trust region shrank to nothing
REASON_REJECTION_LIMIT = 5     # max_consecutive_rejections trials failed
TERMINATION_REASONS = (
    "NO_CONVERGENCE (max iterations)",
    "CONVERGENCE (function tolerance)",
    "CONVERGENCE (gradient tolerance)",
    "CONVERGENCE (parameter tolerance)",
    "NO_CONVERGENCE (trust region collapsed)",
    "NO_CONVERGENCE (consecutive step rejections)",
)


class LMStats(NamedTuple):
    iterations: jnp.ndarray
    final_cost: jnp.ndarray
    grad_max: jnp.ndarray
    converged: jnp.ndarray
    reason: jnp.ndarray
    # final trust-region state — pass back as lm_solve(tr_state=...) to
    # CONTINUE the solve instead of restarting at initial_radius (the g2o
    # optimize() continuation semantics, see chi2_outer_loop)
    radius: jnp.ndarray = jnp.nan
    decrease_factor: jnp.ndarray = jnp.nan


def reason_str(stats: "LMStats") -> str:
    """Human-readable termination reason (FullReport's headline line)."""
    return TERMINATION_REASONS[int(stats.reason)]


def report(stats: "LMStats") -> str:
    """Compact per-solve report — the Ceres FullReport() equivalent the
    reference prints for every multiview solve (icp-ceres.cpp:94)."""
    return (f"LM: iterations={int(stats.iterations)}  "
            f"final_cost={float(stats.final_cost):.6g}  "
            f"max|grad|={float(stats.grad_max):.3g}  "
            f"termination={reason_str(stats)}")


def lm_solve(x0: jnp.ndarray,
             build_system: Callable,
             apply_delta: Callable,
             config: LMConfig = LMConfig(),
             linear_solve: Callable = None,
             tr_state=None):
    """Minimize cost(x) given fused system assembly.

    Args:
      x0: initial parameters (any pytree-leaf array shape).
      build_system: x -> (cost, g (T,), H (T,T)) — Gauss-Newton system in
        the tangent space at x (robust weights folded in by the caller).
      apply_delta: (x, delta (T,)) -> x' — the manifold boxplus.
      config: tolerances/budgets.
      linear_solve: optional (H_damped, g) -> delta = H⁻¹(−g) replacing
        the dense Cholesky (e.g. the frame-graph Schur reduction,
        solvers/schur.py).
      tr_state: optional (radius, decrease_factor) pair — e.g.
        ``(stats.radius, stats.decrease_factor)`` from a previous solve —
        to CONTINUE that solve's trust region instead of restarting at
        ``initial_radius``. This is how g2o behaves across consecutive
        ``optimizer.optimize(100)`` calls on the same graph (its
        SparseOptimizer keeps the LM lambda between calls), which the
        chi2 outer loop (icp-g2o.cpp:261-303) relies on: a converged
        solve leaves a collapsed radius, so the stagnant re-solves the
        loop counts terminate after one iteration instead of re-running
        a full rejection cascade from a fresh radius.

    Returns:
      (x_final, LMStats). Fully jittable; runs as one lax.while_loop.
    """
    cost0, g0, H0 = build_system(x0)
    dtype = cost0.dtype
    if tr_state is None:
        radius0 = jnp.asarray(config.initial_radius, dtype)
        decrease0 = jnp.asarray(2.0, dtype)
    else:
        radius0 = jnp.asarray(tr_state[0], dtype)
        decrease0 = jnp.asarray(tr_state[1], dtype)
    state = LMState(
        x=x0,
        radius=radius0,
        decrease_factor=decrease0,
        cost=cost0,
        grad=g0,
        hess=H0,
        iteration=jnp.asarray(0, jnp.int32),
        # a continued solve whose trust region already collapsed has
        # nothing left to do — skip the loop entirely
        done=radius0 < 1e-32,
        converged=jnp.asarray(False),
        reason=jnp.where(radius0 < 1e-32, REASON_RADIUS_COLLAPSED,
                         REASON_MAX_ITERATIONS).astype(jnp.int32),
        rejections=jnp.asarray(0, jnp.int32),
    )

    def cond(s: LMState):
        return jnp.logical_and(~s.done, s.iteration < config.max_iterations)

    def body(s: LMState):
        T = s.grad.shape[0]
        diag = jnp.clip(jnp.diagonal(s.hess),
                        config.min_diagonal, config.max_diagonal)
        H_damped = s.hess + jnp.diag(diag / s.radius)
        if linear_solve is not None:
            delta = linear_solve(H_damped, s.grad)
        else:
            # solve via Cholesky; fall back to lstsq-ish behaviour through
            # jitter is unnecessary because damping keeps H_damped SPD.
            L = jnp.linalg.cholesky(H_damped)
            delta = jax.scipy.linalg.cho_solve((L, True), -s.grad)
        solve_failed = ~jnp.all(jnp.isfinite(delta))
        delta = jnp.where(solve_failed, jnp.zeros_like(delta), delta)

        # model decrease of 0.5|r|^2 under the GN model
        predicted = -(s.grad @ delta + 0.5 * delta @ (s.hess @ delta))
        x_new = apply_delta(s.x, delta)
        cost_new, g_new, H_new = build_system(x_new)
        rho = (s.cost - cost_new) / jnp.where(
            predicted > 0, predicted, jnp.finfo(dtype).tiny)

        accept = jnp.logical_and(
            jnp.logical_and(rho > config.min_relative_decrease,
                            jnp.isfinite(cost_new)),
            ~solve_failed,
        )

        # Ceres trust-region update
        shrink = jnp.clip(1.0 - (2.0 * rho - 1.0) ** 3, 1.0 / 3.0, None)
        radius_acc = jnp.minimum(s.radius / shrink, config.max_radius)
        radius_rej = s.radius / s.decrease_factor
        radius = jnp.where(accept, radius_acc, radius_rej)
        decrease_factor = jnp.where(accept, 2.0, 2.0 * s.decrease_factor)

        # convergence tests (Ceres semantics, evaluated on accepted steps)
        cost_change = s.cost - cost_new
        f_conv = jnp.abs(cost_change) <= config.function_tolerance * s.cost
        x_norm = jnp.linalg.norm(jnp.ravel(s.x).astype(dtype))
        step_norm = jnp.linalg.norm(delta)
        x_conv = step_norm <= config.parameter_tolerance * (
            x_norm + config.parameter_tolerance)
        g_conv = jnp.max(jnp.abs(jnp.where(accept, g_new, s.grad))) \
            <= config.gradient_tolerance
        converged = jnp.logical_or(
            g_conv, jnp.logical_and(accept, jnp.logical_or(f_conv, x_conv)))
        # a degenerate trust region also terminates
        dead = radius < 1e-32
        rejections = jnp.where(accept, 0, s.rejections + 1).astype(jnp.int32)
        if config.max_consecutive_rejections > 0:
            rej_out = rejections >= config.max_consecutive_rejections
        else:
            rej_out = jnp.asarray(False)
        done = jnp.logical_or(jnp.logical_or(converged, dead), rej_out)
        # first-to-fire criterion, Ceres check order: gradient, then the
        # accepted-step tests, then the degenerate radius
        acc_f = jnp.logical_and(accept, f_conv)
        acc_x = jnp.logical_and(accept, x_conv)
        reason = jnp.where(
            g_conv, REASON_GRADIENT_TOLERANCE,
            jnp.where(acc_f, REASON_FUNCTION_TOLERANCE,
                      jnp.where(acc_x, REASON_PARAMETER_TOLERANCE,
                                jnp.where(dead, REASON_RADIUS_COLLAPSED,
                                          jnp.where(rej_out,
                                                    REASON_REJECTION_LIMIT,
                                                    REASON_MAX_ITERATIONS)))))
        reason = jnp.where(done, reason, s.reason).astype(jnp.int32)

        pick = lambda a, b: jnp.where(accept, a, b)
        return LMState(
            x=jax.tree_util.tree_map(pick, x_new, s.x),
            radius=radius,
            decrease_factor=decrease_factor,
            cost=pick(cost_new, s.cost),
            grad=pick(g_new, s.grad),
            hess=pick(H_new, s.hess),
            iteration=s.iteration + 1,
            done=done,
            converged=converged,
            reason=reason,
            rejections=rejections,
        )

    final = jax.lax.while_loop(cond, body, state)
    stats = LMStats(
        iterations=final.iteration,
        final_cost=final.cost,
        grad_max=jnp.max(jnp.abs(final.grad)),
        converged=final.converged,
        reason=final.reason,
        radius=final.radius,
        decrease_factor=final.decrease_factor,
    )
    return final.x, stats


# ---------------------------------------------------------------------------
# Pairwise ICP solvers (Ceres pairwise equivalents, icp-ceres.cpp:137-218,
# 525-565): given fixed correspondences src[i] <-> dst[i], recover the pose.
# ---------------------------------------------------------------------------

def _block_s(r: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Squared residual-block norm per correspondence (Ceres loss input)."""
    if metric == "point_to_point":
        return jnp.sum(r * r, axis=-1)
    return r * r


def make_pairwise_system(param, metric: str, src, dst, nor=None,
                         weights=None, loss: str = "trivial",
                         loss_scale=1.0, use_autodiff: bool = False,
                         assembly: str = "auto"):
    """Returns build_system(x) for a pairwise problem.

    ``weights`` is a validity/weight mask over correspondences (padded rows
    -> 0). ``loss``/``loss_scale`` select the robust loss (Ceres semantics,
    see ops/robust.py). ``use_autodiff`` switches Jacobians to the
    forward-mode path (the reference's sophusSE3_autodiff flag).

    ``assembly``: the fused Pallas Gram kernel
    (kernels/assemble_pallas.py) evaluates the pairwise system as the
    two-pose global system with the destination pinned at identity
    (exactly the reference's pairwise-from-global functor relationship,
    icp-ceres.h:320-552); "auto" selects it on TPU for se3/f32.
    """
    loss_fn = robust_mod.LOSSES[loss]
    jac_fn = (res_mod.residuals_and_jacobians_autodiff if use_autodiff
              else res_mod.residuals_and_jacobians)
    x_fixed_template = jnp.zeros(param.ambient_dim, dtype=src.dtype)

    def identity_pose():
        if param.ambient_dim == 7:
            return x_fixed_template.at[3].set(1.0)
        return x_fixed_template

    from ..kernels import assemble_pallas as ap

    if ap.resolve_assembly(assembly, param.name, use_autodiff, src.dtype):
        from ..ops.se3 import to_Rt as se3_to_Rt

        N = src.shape[0]
        mask = (jnp.ones(N, jnp.float32) if weights is None
                else weights.astype(jnp.float32))
        nor_k = (jnp.zeros_like(src) if nor is None else nor)
        packed = ap.pack_edges(src[None], dst[None], nor_k[None],
                               mask[None])
        mode = ("lm_p2pl" if metric == "point_to_plane" else "lm_p2pt")
        scale1 = jnp.broadcast_to(
            jnp.asarray(loss_scale, jnp.float32), (1,))
        Rk0 = jnp.eye(3, dtype=jnp.float32)[None]
        tk0 = jnp.zeros((1, 3), jnp.float32)

        def build_system_fused(x):
            R, t = se3_to_Rt(param.to_pose7(x))
            scal = ap.pack_scalars(R[None], t[None], Rk0, tk0, scale1)
            cost_e, g_h, _, H_hh, _, _ = ap.system_terms(
                packed, scal, mode=mode, loss=loss)
            return cost_e[0], g_h[0], H_hh[0]

        return build_system_fused

    def build_system(x):
        r, Jh, _ = jac_fn(param, metric, x, identity_pose(), src, dst, nor)
        s = _block_s(r, metric)
        rho, w = loss_fn(s, loss_scale)
        if weights is not None:
            wmask = weights.astype(src.dtype)
            w = w * wmask
            rho = rho * wmask
        cost = 0.5 * jnp.sum(rho)
        if metric == "point_to_point":
            g = jnp.einsum("nij,ni->j", Jh, w[:, None] * r, precision=_HI)
            H = jnp.einsum("nij,n,nik->jk", Jh, w, Jh, precision=_HI)
        else:
            g = jnp.einsum("nj,n->j", Jh, w * r, precision=_HI)
            H = jnp.einsum("nj,n,nk->jk", Jh, w, Jh, precision=_HI)
        return cost, g, H

    return build_system


@partial(jax.jit, static_argnames=("metric", "loss", "iters"))
def refine_pairwise(pose7, src, dst, nor=None, *,
                    metric: str = "point_to_point", weights=None,
                    loss: str = "trivial", loss_scale=1.0, iters: int = 3):
    """Polish a converged f32 pose with a few f64 Gauss-Newton steps.

    The TPU has no f64 ALUs; XLA emulates f64 at ~2 orders of magnitude
    the f32 cost, so running the reference's full <=50-iteration LM loop
    in f64 (icp-ceres.cpp:45-95 is all-double) wastes that budget. The
    fast f32 trust-region solve lands within ~1e-7 of the optimum and
    Newton convergence is quadratic from there: ``iters`` undamped
    Gauss-Newton steps with residuals/Jacobians evaluated in f64 reach
    the f64 fixed point (diff_tra ~1e-13, the reference's published
    magnitudes, README.md:142-150) for a few ms instead of ~200.

    Requires ``jax_enable_x64``; without it the evaluation silently
    stays f32 and the result matches plain :func:`solve_pairwise`.
    Returns (pose7_refined, per-step cost history).
    """
    param = res_mod.PARAMS["se3"]   # tangent space choice is free here
    if not jax.config.jax_enable_x64:
        import warnings

        warnings.warn(
            "refine_pairwise: jax_enable_x64 is off — the f64 polish runs "
            "in f32 and cannot improve on solve_pairwise; set "
            "JAX_ENABLE_X64=1 (or jax.config.update('jax_enable_x64', "
            "True)) at startup to get reference-grade accuracy",
            stacklevel=2)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else src.dtype
    x = jnp.asarray(pose7, dtype)
    x = x.at[:4].set(x[:4] / jnp.linalg.norm(x[:4]))
    args = [jnp.asarray(a, dtype) if a is not None else None
            for a in (src, dst, nor)]
    system = make_pairwise_system(param, metric, *args, weights=weights,
                                  loss=loss, loss_scale=loss_scale)

    def step(x, _):
        cost, g, H = system(x)
        # tiny Marquardt damping keeps the 6x6 solve safe if the f32
        # start is degenerate; it does not bias the fixed point (g -> 0)
        Hd = H + 1e-12 * jnp.diag(jnp.diagonal(H))
        L = jnp.linalg.cholesky(Hd)
        delta = jax.scipy.linalg.cho_solve((L, True), -g)
        return param.boxplus(x, delta), cost

    x, costs = jax.lax.scan(step, x, None, length=iters)
    return x, costs


@partial(jax.jit, static_argnames=("param_name", "metric", "loss",
                                   "use_autodiff", "config", "assembly"))
def solve_pairwise(src, dst, nor=None, *, param_name: str = "se3",
                   metric: str = "point_to_point", weights=None,
                   loss: str = "trivial", loss_scale=1.0,
                   use_autodiff: bool = False, x0=None,
                   config: LMConfig = LMConfig(), assembly: str = "auto"):
    """Pairwise registration via LM, all parameterizations.

    Equivalent of ICP_Ceres::pointToPoint_* / pointToPlane_*
    (icp-ceres.cpp:137-218, 525-565). Returns (pose7, LMStats).
    """
    param = res_mod.PARAMS[param_name]
    if x0 is None:
        x7 = jnp.zeros(7, dtype=src.dtype).at[3].set(1.0)
        x0 = param.from_pose7(x7)
    else:
        x0 = param.from_pose7(x0)
    system = make_pairwise_system(param, metric, src, dst, nor, weights,
                                  loss, loss_scale, use_autodiff, assembly)
    x, stats = lm_solve(x0, system, param.boxplus, config)
    return param.to_pose7(x), stats
