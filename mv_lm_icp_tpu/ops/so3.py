"""SO(3) operations: hat/vee, exponential/log maps, left/right Jacobians.

TPU-native replacement for the reference's use of Sophus SO3
(reference: include/common.h:46 `Sophus::SO3d::exp` for pose noise, and the
SE(3) machinery in include/sophus_se3.h). Everything is pure jnp, shape
``(..., 3)`` / ``(..., 3, 3)``, vmap/jit friendly, and numerically safe at
theta -> 0 via Taylor branches selected with ``jnp.where`` on a clamped angle
(so gradients stay finite).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]x such that hat(w) @ v == cross(w, v)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w: jnp.ndarray):
    """Angle |w| plus the standard rotation-series coefficients.

    Returns (theta, A, B, C) with
      A = sin(t)/t, B = (1-cos(t))/t^2, C = (t-sin(t))/t^3,
    each with a 4th-order Taylor fallback below _EPS^(1/2)-ish angles.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    # Safe values keep sqrt/div differentiable at 0.
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    A = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
                  jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
                  (1.0 - jnp.cos(theta)) / theta2_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    theta = jnp.where(small, jnp.sqrt(theta2), theta)
    return theta, A, B, C


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: exp([w]x) = I + A [w]x + B [w]x^2."""
    _, A, B, _ = _theta(w)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """V(w) = I + B [w]x + C [w]x^2 — the SO(3) left Jacobian.

    This is the matrix coupling translation and rotation in the SE(3) exp
    (Sophus' internal ``V``; see docs/mv-lm-icp.tex:305-319 for the twist
    Jacobian context).
    """
    _, _, B, C = _theta(w)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Jr(w) = I - B [w]x + C [w]x^2, so exp(w + dw) = exp(w) exp(Jr dw)."""
    return left_jacobian(-w)


def left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """V(w)^-1 = I - 1/2 [w]x + D [w]x^2 with D = (1 - A/(2B))/t^2."""
    theta, A, B, _ = _theta(w)
    theta2 = theta * theta
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    D = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - A / (2.0 * B)) / theta2_safe)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + D[..., None, None] * W2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle log map of a rotation matrix, robust near 0 and pi.

    Routed through the (branchless, vmappable) quaternion extraction in
    :mod:`mv_lm_icp_tpu.ops.quat` to avoid the usual acos instabilities.
    """
    from . import quat  # local import to avoid a cycle

    return quat.to_axis_angle(quat.from_matrix(R))
