"""Closed-form pairwise registration: Eggert/Umeyama SVD and Low's
linearized point-to-plane — batched, masked, on-device.

TPU-native replacement for src/internal/icp-closedform.cpp:

- :func:`point_to_point` ~ ``ICP_Closedform::pointToPoint``
  (icp-closedform.cpp:9-26): demean both clouds, correlation
  ``K = dst_c @ src_c^T``, SVD, ``R = U S V^T`` with the reflection fix,
  ``t = mean(dst) - R mean(src)``. (The reference flips the third column
  of R directly when det<0; we apply the standard Kabsch fix — flip the
  smallest-singular-value column of U — which is the optimal rotation and
  identical whenever det>0, i.e. on all real data here.)
- :func:`point_to_plane` ~ ``ICP_Closedform::pointToPlane``
  (icp-closedform.cpp:30-54): Low's small-angle linearization — 6x6 normal
  equations from rows ``a = [src x n, n]``, rhs ``-a * ((src-dst).n)``,
  solved by Cholesky, rotation recomposed as Rx(a)Ry(b)Rz(c).

Both accept an optional per-correspondence weight/mask vector (so padded
correspondence buffers solve the same system as the reference's pruned
lists) and broadcast over leading batch axes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import se3, so3

# TPU f32 einsums default to one bf16 MXU pass; the normal-equation /
# covariance accumulations need true f32 (see ops/nn.py note).
_HI = jax.lax.Precision.HIGHEST


def _weights(src: jnp.ndarray, w: jnp.ndarray | None) -> jnp.ndarray:
    if w is None:
        return jnp.ones(src.shape[:-1], dtype=src.dtype)
    return w.astype(src.dtype)


def point_to_point(src: jnp.ndarray, dst: jnp.ndarray,
                   weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Optimal rigid transform T with T(src) ~ dst, shape (...,7) se3 param.

    Eggert/Umeyama closed form (icp-closedform.cpp:9-26).
    """
    w = _weights(src, weights)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-30)
    p_mean = jnp.sum(src * w[..., None], axis=-2) / wsum
    q_mean = jnp.sum(dst * w[..., None], axis=-2) / wsum
    ps = (src - p_mean[..., None, :]) * w[..., None]
    qs = dst - q_mean[..., None, :]
    K = jnp.einsum("...ni,...nj->...ij", qs, ps, precision=_HI)
    U, _, Vt = jnp.linalg.svd(K)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    S = jnp.concatenate(
        [jnp.ones(det.shape + (2,), dtype=src.dtype), det[..., None]],
        axis=-1,
    )
    R = jnp.einsum("...ij,...j,...jk->...ik", U, S, Vt)
    t = q_mean - jnp.einsum("...ij,...j->...i", R, p_mean)
    return se3.from_Rt(R, t)


def point_to_plane(src: jnp.ndarray, dst: jnp.ndarray, nor: jnp.ndarray,
                   weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Low's linearized point-to-plane solution, (...,7) se3 param.

    Exact masked-sum equivalent of the loop in icp-closedform.cpp:30-54,
    including the Euler XYZ recomposition Rx(x0) Ry(x1) Rz(x2).
    """
    w = _weights(src, weights)
    cro = jnp.cross(src, nor)
    a = jnp.concatenate([cro, nor], axis=-1)              # (..., N, 6)
    aw = a * w[..., None]
    C = jnp.einsum("...ni,...nj->...ij", aw, a, precision=_HI)
    e = jnp.sum((src - dst) * nor, axis=-1)               # (..., N)
    b = -jnp.einsum("...ni,...n->...i", aw, e, precision=_HI)
    x = jnp.linalg.solve(C, b[..., None])[..., 0]
    zeros = jnp.zeros_like(x[..., 0])

    def axis_rot(angle, axis):
        v = [zeros, zeros, zeros]
        v[axis] = angle
        return so3.exp(jnp.stack(v, axis=-1))

    R = axis_rot(x[..., 0], 0) @ axis_rot(x[..., 1], 1) @ axis_rot(x[..., 2], 2)
    return se3.from_Rt(R, x[..., 3:6])
