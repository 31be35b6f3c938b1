"""Unit quaternion operations in Eigen ``[x, y, z, w]`` storage order.

TPU-native replacement for the reference's Eigen-quaternion helpers and the
custom Ceres local parameterization:

- product convention matches ``EigenQuaternionProduct``
  (reference: include/eigen_quaternion.h:208-214),
- point rotation matches ``EigenUnitQuaternionRotatePoint``
  (include/eigen_quaternion.h:173-187),
- the boxplus operator is the *left-multiplicative* exp-map update
  ``Plus(q, delta) = [sin|d| d/|d|, cos|d|] * q`` of
  ``EigenQuaternionParameterization::Plus``
  (include/eigen_quaternion.h:89-106, docs/mv-lm-icp.tex:168-186).

Note the exp-map here rotates by angle ``2*|delta|`` (the tangent is the
quaternion tangent, not the rotation-vector tangent); the analytic Jacobians
in :mod:`mv_lm_icp_tpu.ops.residuals` carry the matching factor of 2.

All functions are pure jnp, broadcast over leading axes.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def multiply(z: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product z * w in xyzw order (eigen_quaternion.h:208-214)."""
    zx, zy, zz, zw = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    wx, wy, wz, ww = w[..., 0], w[..., 1], w[..., 2], w[..., 3]
    return jnp.stack(
        [
            zx * ww + zy * wz - zz * wy + zw * wx,
            -zx * wz + zy * ww + zz * wx + zw * wy,
            zx * wy - zy * wx + zz * ww + zw * wz,
            -zx * wx - zy * wy - zz * wz + zw * ww,
        ],
        axis=-1,
    )


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate point(s) v by unit quaternion q: v + 2 qw (qv x v) + 2 qv x (qv x v).

    Matches EigenUnitQuaternionRotatePoint (eigen_quaternion.h:173-187).
    """
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix of a unit quaternion (xyzw)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    ww = w * w
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (wy + xz)], -1),
            jnp.stack([2 * (wz + xy), ww - xx + yy - zz, 2 * (yz - wx)], -1),
            jnp.stack([2 * (xz - wy), 2 * (wx + yz), ww - xx - yy + zz], -1),
        ],
        axis=-2,
    )


def from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Branchless rotation-matrix -> unit quaternion (xyzw), vmap friendly.

    Computes all four Shepperd candidates and selects the one keyed by the
    largest of (trace, R00, R11, R22), which is numerically stable for every
    rotation including theta ~ pi.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate built from trace (w-dominant).
    def cand(a, b, c, d):
        return jnp.stack([a, b, c, d], axis=-1)

    sw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0))           # = 2w
    qw = cand(m21 - m12, m02 - m20, m10 - m01, sw * sw)
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0))  # = 2x
    qx = cand(sx * sx, m01 + m10, m02 + m20, m21 - m12)
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0))  # = 2y
    qy = cand(m01 + m10, sy * sy, m12 + m21, m02 - m20)
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0))  # = 2z
    qz = cand(m02 + m20, m12 + m21, sz * sz, m10 - m01)

    # Pick the candidate with the largest pivot.
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
         1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)[..., None]
    q = jnp.select(
        [best == 0, best == 1, best == 2],
        [qw, qx, qy],
        qz,
    )
    return normalize(q)


def exp_map(delta: jnp.ndarray) -> jnp.ndarray:
    """Quaternion exp of a 3-vector tangent: [sin|d| d/|d|, cos|d|] (xyzw).

    This is exactly the update quaternion of the reference's
    EigenQuaternionParameterization (eigen_quaternion.h:96-98); a small-delta
    Taylor branch keeps it differentiable at zero.
    """
    n2 = jnp.sum(delta * delta, axis=-1, keepdims=True)
    small = n2 < _EPS
    n2s = jnp.where(small, 1.0, n2)
    n = jnp.sqrt(n2s)
    sinc = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(n) / n)
    cos = jnp.where(small[..., 0], 1.0 - n2[..., 0] / 2.0, jnp.cos(n[..., 0]))
    return jnp.concatenate([sinc * delta, cos[..., None]], axis=-1)


def boxplus(q: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative manifold update: exp_map(delta) * q.

    Matches EigenQuaternionParameterization::Plus
    (eigen_quaternion.h:89-106).
    """
    return multiply(exp_map(delta), q)


def to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (angle * axis) of a unit quaternion; |result| <= pi."""
    # Force the shortest representation (w >= 0).
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    qv = q[..., :3]
    sin_half2 = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = sin_half2 < _EPS
    sin_half = jnp.sqrt(jnp.where(small, 1.0, sin_half2))
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], q[..., 3])
    scale = jnp.where(small[..., 0], 2.0 / q[..., 3],
                      angle / sin_half[..., 0])
    return scale[..., None] * qv


def from_axis_angle(w: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (xyzw) of a rotation vector."""
    n2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = n2 < _EPS
    n2s = jnp.where(small, 1.0, n2)
    n = jnp.sqrt(n2s)
    half = 0.5 * n
    sinc_half = jnp.where(small, 0.5 - n2 / 48.0, jnp.sin(half) / n)
    cos_half = jnp.where(small[..., 0], 1.0 - n2[..., 0] / 8.0,
                         jnp.cos(half[..., 0]))
    return jnp.concatenate([sinc_half * w, cos_half[..., None]], axis=-1)
