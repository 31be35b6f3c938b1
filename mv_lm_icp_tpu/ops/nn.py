"""Nearest-neighbour search and masked order statistics, pure jnp.

TPU-native replacement for the vendored nanoflann KD-tree
(reference: include/nanoflann.hpp, queried from Frame::getClosestPoint,
src/internal/frame.cpp:187-206). A tree is the wrong shape for a TPU —
pointer chasing and data-dependent recursion don't vectorize — so the
design is tiled brute force: distance blocks computed as matmuls
(`|p-q|^2 = |p|^2 + |q|^2 - 2 p.q`, the cross term riding the MXU) with a
running argmin carried across reference tiles. This module is the jnp
reference implementation (also the CPU/test path); the Pallas kernel in
:mod:`mv_lm_icp_tpu.kernels.nn_pallas` is the tuned TPU version and is
tested for exactness against this one.

Invalid reference points are masked by inflating their distance to +inf;
queries are masked downstream by the caller's validity mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.inf


def _chunk_d2(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances (M, C) between query (M,3) and ref chunk (C,3).

    The cross term must run at full f32 precision: TPU f32 matmuls default
    to a single bf16 MXU pass (~1e-2 relative error), which is larger than
    real point spacings squared and silently corrupts the argmin. The
    expansion can still go slightly negative for self-matches, so clamp.
    """
    qn = jnp.sum(q * q, axis=-1, keepdims=True)           # (M, 1)
    rn = jnp.sum(r * r, axis=-1)[None, :]                  # (1, C)
    cross = jax.lax.dot(q, r.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qn + rn - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("chunk",))
def nn_1(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
         chunk: int = 2048):
    """Exact 1-NN of each query point among valid reference points.

    Args:
      query: (M, 3).
      ref: (N, 3); N should be a multiple of ``chunk`` for best layout
        (callers pad; padded rows must be marked invalid).
      ref_valid: (N,) bool.
      chunk: reference tile size (static).

    Returns:
      (idx, dist2): int32 (M,) argmin indices and float (M,) squared
      distances. Replaces nanoflann ``findNeighbors`` 1-NN queries
      (frame.cpp:187-206).
    """
    M = query.shape[0]
    N = ref.shape[0]
    nchunks = -(-N // chunk)
    pad = nchunks * chunk - N
    if pad:
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
        ref_valid = jnp.pad(ref_valid, (0, pad))
    ref_c = ref.reshape(nchunks, chunk, 3)
    valid_c = ref_valid.reshape(nchunks, chunk)

    def body(carry, inp):
        best_d, best_i = carry
        r, v, base = inp
        d2 = _chunk_d2(query, r)
        d2 = jnp.where(v[None, :], d2, BIG)
        i_local = jnp.argmin(d2, axis=1)
        d_local = jnp.take_along_axis(d2, i_local[:, None], axis=1)[:, 0]
        take = d_local < best_d
        best_d = jnp.where(take, d_local, best_d)
        best_i = jnp.where(take, base + i_local.astype(jnp.int32), best_i)
        return (best_d, best_i), None

    init = (jnp.full((M,), BIG, dtype=query.dtype),
            jnp.zeros((M,), dtype=jnp.int32))
    bases = (jnp.arange(nchunks, dtype=jnp.int32) * chunk)
    (best_d, best_i), _ = jax.lax.scan(body, init, (ref_c, valid_c, bases))
    return best_i, best_d


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
        k: int, chunk: int = 2048):
    """Exact k-NN (sorted ascending) of each query among valid ref points.

    Used for the PCA-normal neighbourhoods (k=10; frame.cpp:208-242,
    recomputeNormals frame.cpp:244-255). Note: when query points belong to
    ``ref`` itself the point is its own first neighbour, same as the
    reference's behaviour.

    Returns (idx (M,k) int32, dist2 (M,k)).
    """
    M = query.shape[0]
    N = ref.shape[0]
    nchunks = -(-N // chunk)
    pad = nchunks * chunk - N
    if pad:
        ref = jnp.pad(ref, ((0, pad), (0, 0)))
        ref_valid = jnp.pad(ref_valid, (0, pad))
    ref_c = ref.reshape(nchunks, chunk, 3)
    valid_c = ref_valid.reshape(nchunks, chunk)

    def body(carry, inp):
        best_d, best_i = carry                       # (M, k) each
        r, v, base = inp
        d2 = jnp.where(v[None, :], _chunk_d2(query, r), BIG)
        # local top-k then merge with carry
        neg_d, i_local = jax.lax.top_k(-d2, k)       # (M, k)
        cand_d = jnp.concatenate([best_d, -neg_d], axis=1)
        cand_i = jnp.concatenate(
            [best_i, base + i_local.astype(jnp.int32)], axis=1)
        neg_d2, sel = jax.lax.top_k(-cand_d, k)
        best_d = -neg_d2
        best_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (best_d, best_i), None

    init = (jnp.full((M, k), BIG, dtype=query.dtype),
            jnp.zeros((M, k), dtype=jnp.int32))
    bases = (jnp.arange(nchunks, dtype=jnp.int32) * chunk)
    (best_d, best_i), _ = jax.lax.scan(body, init, (ref_c, valid_c, bases))
    return best_i, best_d


def masked_median(x: jnp.ndarray, valid: jnp.ndarray,
                  fallback: float = 1.0) -> jnp.ndarray:
    """Median over valid entries with the reference's index convention.

    The reference takes ``nth_element`` at index ``size/2`` of the pruned
    distance list (frame.cpp:166-176) — i.e. the upper median element
    ``sorted[m // 2]`` of the m valid values. Masked equivalence: sort with
    invalid entries pushed to +inf and index at ``m // 2``. Returns
    ``fallback`` when no entry is valid (the reference would read garbage).

    Works on the last axis; broadcast/vmap for batches.
    """
    m = jnp.sum(valid.astype(jnp.int32), axis=-1)
    big = jnp.asarray(jnp.inf, dtype=x.dtype)
    s = jnp.sort(jnp.where(valid, x, big), axis=-1)
    idx = jnp.clip(m // 2, 0, x.shape[-1] - 1)
    med = jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
    return jnp.where(m > 0, med, jnp.asarray(fallback, dtype=x.dtype))
