"""PCA surface normals, batched on device.

TPU-native replacement for ``pointSetPCA`` (reference: include/common.h:
331-346) and ``Frame::recomputeNormals`` (src/internal/frame.cpp:244-255):
per point, take the k=10 nearest neighbours (the point itself included, as
nanoflann returns it first), eigen-decompose the 3x3 neighbourhood
covariance, use the smallest-eigenvalue eigenvector as the normal, flip it
toward the camera (``normal.z > 0 -> negate``), and report curvature
``lambda_0 / sum(lambda)``.

The reference loops point-by-point with a KD-tree; here the whole cloud is
one batched knn + one batched 3x3 ``eigh``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import nn


def pca_normal(neigh: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Normal + curvature of point neighbourhoods.

    Args:
      neigh: (..., K, 3) neighbour coordinates.
      valid: optional (..., K) bool mask over neighbours.

    Returns:
      (normal (...,3) unit, curvature (...)) with the camera-flip convention
      of common.h:343 (normals point toward -z).
    """
    if valid is None:
        w = jnp.ones(neigh.shape[:-1], dtype=neigh.dtype)
    else:
        w = valid.astype(neigh.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    centroid = jnp.sum(neigh * w[..., None], axis=-2, keepdims=True) / cnt[..., None]
    centered = (neigh - centroid) * w[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered,
                     precision=jax.lax.Precision.HIGHEST)
    evals, evecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    normal = evecs[..., :, 0]
    normal = jnp.where(normal[..., 2:3] > 0, -normal, normal)
    curvature = evals[..., 0] / jnp.maximum(
        jnp.sum(evals, axis=-1), jnp.finfo(neigh.dtype).tiny)
    return normal, curvature


#: above this cloud size, recompute_normals switches from the O(N^2)
#: brute k-NN to the sorted-window sweep (O(N*W)); at the large-scene
#: shapes (8 x 244k pts) the quadratic search would dominate preprocessing
WINDOW_THRESHOLD = 32768


def eigh3_smallest(cxx, cxy, cxz, cyy, cyz, czz):
    """Smallest eigenpair of symmetric 3x3 matrices, SoA layout.

    TPU-shaped eigensolver: six (N,) component arrays in, no (N, 3, 3)
    materialization — a batched ``jnp.linalg.eigh`` at N in the millions
    tile-pads each 3x3 to an (8, 128) TPU tile, a 340x memory blowup that
    OOMs HBM; these trigonometric (Cardano) eigenvalues + cross-product
    eigenvectors stay in flat (N,) registers end to end. Replaces Eigen's
    SelfAdjointEigenSolver in pointSetPCA (common.h:341).

    Returns (nx, ny, nz unit eigenvector, lam_min, trace).
    """
    dtype = cxx.dtype
    eps = jnp.finfo(dtype).tiny
    q = (cxx + cyy + czz) / 3.0
    p1 = cxy * cxy + cxz * cxz + cyz * cyz
    dx, dy, dz = cxx - q, cyy - q, czz - q
    p2 = dx * dx + dy * dy + dz * dz + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, eps)
    # r = det(B) / 2 with B = (A - qI) / p
    bxx, byy, bzz = dx / safe_p, dy / safe_p, dz / safe_p
    bxy, bxz, byz = cxy / safe_p, cxz / safe_p, cyz / safe_p
    detb = (bxx * (byy * bzz - byz * byz)
            - bxy * (bxy * bzz - byz * bxz)
            + bxz * (bxy * byz - byy * bxz))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # eigenvector of lam_min: largest cross product of rows of (A - lam I)
    r0x, r0y, r0z = cxx - lam_min, cxy, cxz
    r1x, r1y, r1z = cxy, cyy - lam_min, cyz
    r2x, r2y, r2z = cxz, cyz, czz - lam_min

    def cross(ax, ay, az, bx, by, bz):
        return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx

    c0 = cross(r0x, r0y, r0z, r1x, r1y, r1z)
    c1 = cross(r0x, r0y, r0z, r2x, r2y, r2z)
    c2 = cross(r1x, r1y, r1z, r2x, r2y, r2z)
    n0 = c0[0] ** 2 + c0[1] ** 2 + c0[2] ** 2
    n1 = c1[0] ** 2 + c1[1] ** 2 + c1[2] ** 2
    n2 = c2[0] ** 2 + c2[1] ** 2 + c2[2] ** 2
    best01 = n0 >= n1
    vx = jnp.where(best01, c0[0], c1[0])
    vy = jnp.where(best01, c0[1], c1[1])
    vz = jnp.where(best01, c0[2], c1[2])
    nb = jnp.where(best01, n0, n1)
    take2 = n2 > nb
    vx = jnp.where(take2, c2[0], vx)
    vy = jnp.where(take2, c2[1], vy)
    vz = jnp.where(take2, c2[2], vz)
    nb = jnp.where(take2, n2, nb)
    # degenerate (isotropic / rank-deficient beyond the eigenvalue):
    # any direction is an eigenvector — pick +z (flipped to -z below)
    degen = nb <= eps
    inv = jnp.where(degen, 1.0, 1.0 / jnp.sqrt(jnp.maximum(nb, eps)))
    vx = jnp.where(degen, 0.0, vx * inv)
    vy = jnp.where(degen, 0.0, vy * inv)
    vz = jnp.where(degen, 1.0, vz * inv)
    trace = cxx + cyy + czz
    return vx, vy, vz, lam_min, trace


@partial(jax.jit, static_argnames=("k", "chunk", "window", "use_pallas"))
def recompute_normals(points: jnp.ndarray, valid: jnp.ndarray,
                      k: int = 10, chunk: int = 2048,
                      window: int | None = None,
                      use_pallas: bool | None = None):
    """Per-point PCA normals from k nearest neighbours within the cloud.

    Matches Frame::recomputeNormals (frame.cpp:244-255): the query point is
    a member of ``points`` so it is its own nearest neighbour, giving the
    same k-point neighbourhood as the reference (getNeighbours(i, 10)).

    Neighbour search: brute-force exact k-NN for small clouds; above
    ``WINDOW_THRESHOLD`` points (or when ``window`` is passed) the
    sorted-window k-NN (ops/nn_window.knn_window — the scalable
    replacement for the reference's KD-tree ``getNeighbours``,
    frame.cpp:208-242). Window results carry per-query exactness
    certificates; for k=10 neighbourhoods the default W covers the true
    neighbourhood except in pathological density spikes, and an
    uncertified neighbourhood still yields a well-posed PCA normal from
    near-nearest neighbours.

    Invalid (padding) points get a placeholder normal [0,0,-1].

    Returns (normals (N,3), curvature (N,)).
    """
    N = points.shape[0]
    use_window = window is not None or N > WINDOW_THRESHOLD
    if use_window:
        W = window if window is not None else 8192
        if use_pallas is None:
            use_pallas = jax.devices()[0].platform == "tpu"
        if use_pallas:
            # the tuned kernel (kernels/nn_window_pallas.knn_window_batch)
            # — same sorted-window neighbourhoods, ~k*3 VPU passes per
            # window tile instead of an XLA top_k sort per tile
            from ..kernels import nn_window_pallas

            idx, _, _ = nn_window_pallas.knn_window_batch(
                points[None], points[None], valid[None], k=k, window=W,
                query_valid=valid[None], self_query=True)
            idx = idx[0]
        else:
            from . import nn_window

            idx, _, _ = nn_window.knn_window(points, points, valid, k=k,
                                             window=W, query_valid=valid)
    else:
        idx, _ = nn.knn(points, points, valid, k=k, chunk=chunk)

    # Covariance via moment accumulation in SoA (N,) arrays: gathering an
    # (N, k, 3) neighbourhood tensor tile-pads (k, 3) minor dims to
    # (16, 128) on TPU — a 68x memory blowup that OOMs at million-point
    # clouds. Neighbourhoods are centred on the query point itself so the
    # f32 second moments never cancel catastrophically (coords can be
    # O(100) while neighbourhood extents are O(1e-3)).
    dtype = points.dtype
    w = valid[idx].astype(dtype)                     # (N, k)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    sx = sy = sz = sxx = sxy = sxz = syy = syz = szz = jnp.zeros(N, dtype)
    for j in range(k):
        d = points[idx[:, j]] - points               # (N, 3), tiny values
        wj = w[:, j]
        x, y, z = wj * d[:, 0], wj * d[:, 1], wj * d[:, 2]
        sx, sy, sz = sx + x, sy + y, sz + z
        sxx, sxy, sxz = sxx + x * d[:, 0], sxy + x * d[:, 1], \
            sxz + x * d[:, 2]
        syy, syz, szz = syy + y * d[:, 1], syz + y * d[:, 2], \
            szz + z * d[:, 2]
    vx, vy, vz, lam, tr = eigh3_smallest(
        sxx - sx * sx / cnt, sxy - sx * sy / cnt, sxz - sx * sz / cnt,
        syy - sy * sy / cnt, syz - sy * sz / cnt, szz - sz * sz / cnt)
    flip = vz > 0                                    # camera flip
    normal = jnp.stack([jnp.where(flip, -vx, vx),
                        jnp.where(flip, -vy, vy),
                        jnp.where(flip, -vz, vz)], axis=1)
    curv = lam / jnp.maximum(tr, jnp.finfo(dtype).tiny)
    placeholder = jnp.asarray([0.0, 0.0, -1.0], dtype=dtype)
    normal = jnp.where(valid[:, None], normal, placeholder)
    return normal, curv
