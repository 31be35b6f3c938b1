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


@partial(jax.jit, static_argnames=("k", "chunk"))
def recompute_normals(points: jnp.ndarray, valid: jnp.ndarray,
                      k: int = 10, chunk: int = 2048):
    """Per-point PCA normals from k nearest neighbours within the cloud.

    Matches Frame::recomputeNormals (frame.cpp:244-255): the query point is
    a member of ``points`` so it is its own nearest neighbour, giving the
    same k-point neighbourhood as the reference (getNeighbours(i, 10)).

    Invalid (padding) points get a placeholder normal [0,0,-1].

    Returns (normals (N,3), curvature (N,)).
    """
    idx, _ = nn.knn(points, points, valid, k=k, chunk=chunk)
    neigh = points[idx]                       # (N, k, 3)
    neigh_valid = valid[idx]                  # padding can't be a neighbour
    normal, curv = pca_normal(neigh, neigh_valid)
    placeholder = jnp.asarray([0.0, 0.0, -1.0], dtype=points.dtype)
    normal = jnp.where(valid[:, None], normal, placeholder)
    return normal, curv
