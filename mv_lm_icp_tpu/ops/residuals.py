"""Residuals and analytic tangent-space Jacobians for ICP energies.

TPU-native replacement for the reference's ten Ceres autodiff cost functors
(reference: include/icp-ceres.h:47-554, ``ICPCostFunctions`` namespace) and
the LocalParameterization machinery. Where Ceres evaluates jets per
correspondence and chains a separate 4x3/6x7 parameterization Jacobian
(include/eigen_quaternion.h:108-114, include/sophus_se3.h:45-51), we
differentiate the *composition* residual(boxplus(x, delta)) at delta = 0
analytically, yielding dense (N, d, 6) Jacobian blocks evaluated as batched
einsums — the shape the MXU wants.

Energies (docs/mv-lm-icp.tex:102-114):
  point-to-point (global):  r = (R_h p + t_h) - (R_k q + t_k)
  point-to-plane (global):  r = ((R_h p + t_h) - (R_k q + t_k)) . (R_k n)
                            -- the destination normal is rotated but NOT
                               translated (icp-ceres.h:134, :309).
Pairwise forms are the global forms with the destination pose pinned to
identity (icp-ceres.h:320-552).

Parameterizations (tangent is always 6-dim; ordering is per-param,
consistent between ``boxplus`` and the Jacobians):

- ``se3``:    ambient (7,) [qxyzw, t], tangent [nu, omega] (Sophus order),
              right-multiplicative boxplus T*exp(tau) (sophus_se3.h:31-38).
- ``quat``:   ambient (7,) [qxyzw, t], tangent [dq, dt], left-multiplicative
              quaternion boxplus (eigen_quaternion.h:89-106). The quaternion
              tangent rotates by angle 2|dq|, hence the factors of 2 below.
- ``angle_axis``: ambient (6,) [aa, t], Euclidean increment (Ceres treats
              the angle-axis block as a plain vector, icp-ceres.cpp:325-395).

The ``*_autodiff`` twins compute the same Jacobians with jax.jacfwd through
``boxplus`` — the replacement for Ceres' jets and the reference's
``sophusSE3_autodiff`` flag — and double as the correctness oracle for the
analytic forms.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from . import quat, se3, so3

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Parameterizations
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Parameterization:
    name: str
    ambient_dim: int
    boxplus: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    to_pose7: Callable[[jnp.ndarray], jnp.ndarray]
    from_pose7: Callable[[jnp.ndarray], jnp.ndarray]


def _quat_boxplus(x, delta):
    q = quat.boxplus(x[..., :4], delta[..., :3])
    return jnp.concatenate([q, x[..., 4:7] + delta[..., 3:6]], axis=-1)


def _aa_to_pose7(x):
    return jnp.concatenate(
        [quat.from_axis_angle(x[..., :3]), x[..., 3:6]], axis=-1)


def _aa_from_pose7(x7):
    return jnp.concatenate(
        [quat.to_axis_angle(x7[..., :4]), x7[..., 4:7]], axis=-1)


SE3 = Parameterization("se3", 7, se3.boxplus, lambda x: x, lambda x: x)
QUAT = Parameterization("quat", 7, _quat_boxplus, lambda x: x, lambda x: x)
ANGLE_AXIS = Parameterization("angle_axis", 6, lambda x, d: x + d,
                              _aa_to_pose7, _aa_from_pose7)

PARAMS = {"se3": SE3, "quat": QUAT, "angle_axis": ANGLE_AXIS}


# ---------------------------------------------------------------------------
# Residuals (cheap path, no Jacobians)
# ---------------------------------------------------------------------------

def residuals(param: Parameterization, metric: str, x_h, x_k, p, q, n=None):
    """Residual array for one edge: (N, 3) for p2pt, (N,) for p2pl."""
    ph = se3.apply(param.to_pose7(x_h), p)
    pk = se3.apply(param.to_pose7(x_k), q)
    d = ph - pk
    if metric == "point_to_point":
        return d
    ng = se3.rotate_only(param.to_pose7(x_k), n)
    return jnp.sum(d * ng, axis=-1)


# ---------------------------------------------------------------------------
# Analytic residual + Jacobian blocks
# ---------------------------------------------------------------------------

def _pose_cache(param: Parameterization, x):
    """Per-pose precomputation: (R, t, Jr-or-None)."""
    x7 = param.to_pose7(x)
    R, t = se3.to_Rt(x7)
    Jr = so3.right_jacobian(x[..., :3]) if param.name == "angle_axis" else None
    return R, t, Jr


def _rot_block(param, R, pts_local, pts_rotated, Jr):
    """d(R_x p)/d(rot tangent) as (N, 3, 3).

    se3:        -R [p_local]x            (right-mult tangent, body frame)
    quat:       -2 [R p_local]x          (left-mult tangent, world frame;
                                          factor 2 from the half-angle-free
                                          exp map, translation NOT included)
    angle_axis: -R [p_local]x Jr(aa)
    """
    if param.name == "quat":
        return -2.0 * so3.hat(pts_rotated)
    M = -jnp.einsum("ij,njk->nik", R, so3.hat(pts_local), precision=_HI)
    if param.name == "angle_axis":
        M = jnp.einsum("nij,jk->nik", M, Jr, precision=_HI)
    return M


def _assemble(param, rot_j, tra_j):
    """Stack rotation/translation Jacobian blocks in the param's tangent
    order: se3 = [tra, rot] (Sophus), others = [rot, tra]."""
    if param.name == "se3":
        return jnp.concatenate([tra_j, rot_j], axis=-1)
    return jnp.concatenate([rot_j, tra_j], axis=-1)


def _se3_p2pl_fast(R_h, t_h, R_k, t_k, p, q, n):
    """Closed-form se3 point-to-plane (r, J_h, J_k) without (N, 3, 3)
    intermediates.

    The general path materializes per-point hat matrices and chains them
    through einsums; for the right-multiplicative se3 tangent and the
    p2pl projection everything collapses to two small rotations and
    three cross products (derivation from the general blocks:
    J_h = [R_h^T n_g ; p x (R_h^T n_g)],
    J_k = [-n ; n x (R_k^T d) - q x n] — the second rot term is the
    rotated-normal derivative d . d(R_k n)/drot_k of the reference
    functor, icp-ceres.h:109-141). Verified against the autodiff twins
    by tests/test_residuals.py.
    """
    rp = p @ R_h.T
    rq = q @ R_k.T
    d = rp + t_h - rq - t_k
    ng = n @ R_k.T
    r = jnp.sum(d * ng, axis=-1)
    u = ng @ R_h                              # = R_h^T n_g
    w2 = d @ R_k                              # = R_k^T d
    Jh = jnp.concatenate([u, jnp.cross(p, u)], axis=-1)
    Jk = jnp.concatenate([-n, jnp.cross(n, w2) - jnp.cross(q, n)],
                         axis=-1)
    return r, Jh, Jk


def residuals_and_jacobians(param: Parameterization, metric: str,
                            x_h, x_k, p, q, n=None):
    """Analytic (r, J_h, J_k) for one edge.

    Shapes: p2pt -> r (N,3), J (N,3,6); p2pl -> r (N,), J (N,6).
    """
    R_h, t_h, Jr_h = _pose_cache(param, x_h)
    R_k, t_k, Jr_k = _pose_cache(param, x_k)
    if param.name == "se3" and metric == "point_to_plane":
        return _se3_p2pl_fast(R_h, t_h, R_k, t_k, p, q, n)
    rp = p @ R_h.T                             # (N, 3) rotated src
    rq = q @ R_k.T                             # (N, 3) rotated dst
    gp = rp + t_h
    gq = rq + t_k
    d = gp - gq
    N = p.shape[0]

    # Translation blocks: for the right-multiplicative se3 update the
    # tangent nu is expressed in the body frame, so d(gp)/dnu_h = R_h;
    # quat/angle_axis update the global translation directly -> identity.
    if param.name == "se3":
        tra_h = jnp.broadcast_to(R_h, (N, 3, 3))
        tra_k = jnp.broadcast_to(-R_k, (N, 3, 3))
    else:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=p.dtype), (N, 3, 3))
        tra_h, tra_k = eye, -eye
    Jh_rot = _rot_block(param, R_h, p, rp, Jr_h)
    Jk_rot = -_rot_block(param, R_k, q, rq, Jr_k)
    Jh_pt = _assemble(param, Jh_rot, tra_h)
    Jk_pt = _assemble(param, Jk_rot, tra_k)

    if metric == "point_to_point":
        return d, Jh_pt, Jk_pt

    ng = n @ R_k.T                             # rotated dst normal
    r = jnp.sum(d * ng, axis=-1)
    Jh = jnp.einsum("ni,nij->nj", ng, Jh_pt, precision=_HI)
    Jk = jnp.einsum("ni,nij->nj", ng, Jk_pt, precision=_HI)
    # normal-rotation term: d . d(ng)/d(rot tangent of k)
    nrot = _rot_block(param, R_k, n, ng, Jr_k)      # (N, 3, 3)
    extra = jnp.einsum("ni,nij->nj", d, nrot, precision=_HI)
    zeros = jnp.zeros_like(extra)
    Jk = Jk + _assemble(param, extra, zeros)
    return r, Jh, Jk


# ---------------------------------------------------------------------------
# Autodiff twins (Ceres-jet replacement; also the test oracle)
# ---------------------------------------------------------------------------

def p2pl_system_terms(r, Jh, Jk, w, rho, mask):
    """One-pass normal-equation terms for the point-to-plane metric.

    Stacks A = [J_h | J_k | r] (N, 13) and contracts M = A^T diag(w) A
    ONCE, instead of five einsums each re-streaming the (N, 6) Jacobian
    blocks from HBM — per LM iteration the Jacobians are read once, not
    three times each (the Hessian assembly is HBM-bound, not FLOP-bound:
    BENCHMARKS.md roofline). The summands are identical to the separate
    einsums; only the pass structure changes.

    Args: r (N,) p2pl residuals; Jh/Jk (N, 6); w (N,) IRLS weights with
    the validity mask already applied; rho (N,) robust losses; mask (N,)
    validity for the cost sum.
    Returns (cost_e, g_h, g_k, H_hh, H_hk, H_kk).
    """
    a = jnp.concatenate([Jh, Jk, r[:, None]], axis=-1)    # (N, 13)
    M = jnp.einsum("nj,n,nk->jk", a, w, a, precision=_HI)
    cost_e = 0.5 * jnp.sum(rho * mask)
    return (cost_e, M[:6, 12], M[6:12, 12],
            M[:6, :6], M[:6, 6:12], M[6:12, 6:12])


def residuals_and_jacobians_autodiff(param: Parameterization, metric: str,
                                     x_h, x_k, p, q, n=None):
    """(r, J_h, J_k) via forward-mode jacobians of boxplus at delta = 0."""
    dtype = p.dtype
    if n is None:
        n = jnp.zeros_like(p)

    def point_residual(dh, dk, p1, q1, n1):
        xh = param.boxplus(x_h, dh)
        xk = param.boxplus(x_k, dk)
        ph = se3.apply(param.to_pose7(xh), p1)
        pk = se3.apply(param.to_pose7(xk), q1)
        diff = ph - pk
        if metric == "point_to_point":
            return diff
        ng = se3.rotate_only(param.to_pose7(xk), n1)
        return jnp.sum(diff * ng)

    zero = jnp.zeros(6, dtype=dtype)
    r = jax.vmap(lambda p1, q1, n1: point_residual(zero, zero, p1, q1, n1))(
        p, q, n)
    jac = jax.vmap(
        jax.jacfwd(point_residual, argnums=(0, 1)),
        in_axes=(None, None, 0, 0, 0),
    )(zero, zero, p, q, n)
    return r, jac[0], jac[1]
