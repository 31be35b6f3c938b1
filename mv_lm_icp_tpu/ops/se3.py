"""SE(3) rigid transforms stored as 7-vectors ``[qx, qy, qz, qw, tx, ty, tz]``.

TPU-native replacement for Eigen ``Isometry3d`` + Sophus ``SE3d`` as used by
the reference:

- exp/log with Sophus tangent ordering ``[nu(translation), omega(rotation)]``
  and the right-multiplicative boxplus ``T * exp(delta)`` of
  ``LocalParameterizationSE3`` (reference: include/sophus_se3.h:10-60,
  docs/mv-lm-icp.tex:305-319),
- ``add_noise`` replicates the reference pose-perturbation model
  ``R' = R * exp(sigma * n3),  t' = t + sigmat * n3``
  (include/common.h:38-67),
- ``pose_diff`` replicates the accuracy metric: translation L2 plus the
  quaternion angle ``acos(2 <q1,q2>^2 - 1)`` in degrees
  (include/common.h:259-282).

Everything broadcasts over leading axes; a frame set's poses live in a single
``[F, 7]`` array.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quat, so3


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype=dtype)


def from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([quat.from_matrix(R), t], axis=-1)


def to_Rt(x: jnp.ndarray):
    """Returns (R[...,3,3], t[...,3])."""
    return quat.to_matrix(x[..., :4]), x[..., 4:7]


def from_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """From a homogeneous 4x4 (or 3x4) matrix."""
    return from_Rt(T[..., :3, :3], T[..., :3, 3])


def to_matrix(x: jnp.ndarray) -> jnp.ndarray:
    R, t = to_Rt(x)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=x.dtype),
        top.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a * b (apply b first, then a)."""
    qa, ta = a[..., :4], a[..., 4:7]
    qb, tb = b[..., :4], b[..., 4:7]
    q = quat.normalize(quat.multiply(qa, qb))
    t = ta + quat.rotate(qa, tb)
    return jnp.concatenate([q, t], axis=-1)


def inverse(x: jnp.ndarray) -> jnp.ndarray:
    qi = quat.conjugate(x[..., :4])
    ti = -quat.rotate(qi, x[..., 4:7])
    return jnp.concatenate([qi, ti], axis=-1)


def apply(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Transform point(s): R p + t."""
    return quat.rotate(x[..., :4], p) + x[..., 4:7]


def rotate_only(x: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) without translating (e.g. normals)."""
    return quat.rotate(x[..., :4], v)


def exp(tau: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exp with Sophus tangent order tau = [nu(3), omega(3)]."""
    nu, omega = tau[..., :3], tau[..., 3:6]
    q = quat.from_axis_angle(omega)
    V = so3.left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, nu)
    return jnp.concatenate([q, t], axis=-1)


def log(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`exp`; returns [nu, omega]."""
    omega = quat.to_axis_angle(x[..., :4])
    Vinv = so3.left_jacobian_inv(omega)
    nu = jnp.einsum("...ij,...j->...i", Vinv, x[..., 4:7])
    return jnp.concatenate([nu, omega], axis=-1)


def boxplus(x: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
    """Right-multiplicative update T * exp(tau) (sophus_se3.h:31-38)."""
    return compose(x, exp(tau))


def add_noise(key: jax.Array, x: jnp.ndarray, sigma: float,
              sigmat: float) -> jnp.ndarray:
    """Perturb pose(s): R' = R exp(sigma*N(0,I)), t' = t + sigmat*N(0,I).

    Replicates ``addNoise`` (include/common.h:38-67): the rotation noise is
    right-multiplied onto the rotation only, the translation offset is added
    in the global frame.
    """
    kr, kt = jax.random.split(key)
    shape = x.shape[:-1] + (3,)
    w = sigma * jax.random.normal(kr, shape, dtype=x.dtype)
    dt = sigmat * jax.random.normal(kt, shape, dtype=x.dtype)
    qn = quat.from_axis_angle(w)
    q = quat.normalize(quat.multiply(x[..., :4], qn))
    return jnp.concatenate([q, x[..., 4:7] + dt], axis=-1)


def pose_diff(x1: jnp.ndarray, x2: jnp.ndarray):
    """(translation L2 distance, rotation angle difference in degrees).

    Replicates ``poseDiff`` (include/common.h:259-282):
    ``diff_rot = acos(clamp(2 <q1,q2>^2 - 1)) * 180/pi``.
    """
    diff_tra = jnp.linalg.norm(x1[..., 4:7] - x2[..., 4:7], axis=-1)
    d = jnp.sum(x1[..., :4] * x2[..., :4], axis=-1)
    val = jnp.clip(2.0 * d * d - 1.0, -1.0, 1.0)
    diff_rot = jnp.degrees(jnp.arccos(val))
    return diff_tra, diff_rot
