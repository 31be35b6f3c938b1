"""Sorted-window nearest-neighbour search: O(M·W) streaming, no gathers.

The third NN backend (after tiled brute force and the grid hash),
designed for LARGE clouds on TPU. The grid hash (ops/nn_grid.py) is the
classic O(N·K) structure, but its candidate fetch is an elementwise
gather — random HBM access the TPU executes orders of magnitude slower
than streaming reads (measured: 7.7 s per 8x61k-frame round vs 0.04 s
for this backend). The TPU-native shape of "only look at nearby points"
is instead a *contiguous window over a sorted axis*:

1. sort the reference cloud once along its dominant (largest-extent)
   axis; sort queries the same way,
2. each tile of consecutive sorted queries takes ONE ``dynamic_slice``
   of W consecutive sorted reference rows — the only "pointer" in the
   whole algorithm, and it is a contiguous streaming read,
3. tile x window runs the same exact-f32 squared-difference brute force
   as the main kernels, masked by true distance.

Exactness-within-cutoff argument (same contract as the grid backend,
matching the pipeline's pruning semantics, frame.cpp:156-160): a true
nearest neighbour at distance < cutoff differs from the query by less
than cutoff along EVERY axis, so it lies inside the sorted-axis interval
[tile_min - cutoff, tile_max + cutoff]. If the window covers that whole
interval, any reported d <= cutoff is the true NN; where the interval
is wider than W rows the affected queries are reported unmatched
(idx -1, d2 = +inf) rather than silently wrong — ``window_shortfall``
measures how much W was missing for a given cloud/tile size.

Replaces nanoflann (include/nanoflann.hpp) for the 'large synthetic
scene' configuration; cited in SURVEY §7.3.2.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.inf


def _dominant_axis_coord(pts: jnp.ndarray, valid: jnp.ndarray):
    """Coordinate of every point along the largest-extent axis (traced)."""
    big = jnp.asarray(1e30, pts.dtype)
    lo = jnp.min(jnp.where(valid[:, None], pts, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pts, -big), axis=0)
    axis = jnp.argmax(hi - lo)
    return pts[:, axis], axis


@partial(jax.jit, static_argnames=("window", "query_chunk"))
def nn_1_window(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
                cutoff: float, window: int = 8192, query_chunk: int = 512,
                query_valid: jnp.ndarray | None = None):
    """Exact-within-cutoff 1-NN via the sorted-window sweep.

    Args:
      query: (M, 3). ref: (N, 3). ref_valid: (N,) bool.
      cutoff: pruning radius (the ICP dmax); also the window guard band.
      window: W, consecutive sorted reference rows scanned per query tile
        (static; rounded work = M * W).
      query_chunk: queries per tile (static).
      query_valid: optional (M,) bool. Invalid queries (FrameSet padding
        rows, whose pad coords survive pose transforms as merely-large
        finite values) are moved to the sentinel BEFORE sorting so they
        sort away from real queries and never inflate a tile's coverage
        interval (they'd otherwise silently un-cover boundary tiles and
        drop real correspondences — the ragged-cloud failure mode).

    Returns (idx (M,) int32, d2 (M,), uncovered int32): idx = -1 /
    d2 = +inf when no valid neighbour within cutoff is provable from the
    window; ``uncovered`` counts valid queries living in tiles whose
    guard interval exceeded W (0 == the exactness-within-cutoff proof
    held for every real query this call).
    """
    M, N = query.shape[0], ref.shape[0]
    dtype = ref.dtype
    cutoff = jnp.asarray(cutoff, dtype)
    W = min(window, N)
    C = query_chunk

    rx, axis = _dominant_axis_coord(ref, ref_valid)
    # invalid refs sort to the far end and carry far-away sentinel coords
    rx = jnp.where(ref_valid, rx, jnp.asarray(1e30, dtype))
    order_r = jnp.argsort(rx)
    ref_s = ref[order_r]
    rx_s = rx[order_r]
    ref_s = jnp.where((rx_s < 1e29)[:, None], ref_s, 1e9)

    qx = query[:, axis]
    if query_valid is not None:
        qx = jnp.where(query_valid, qx, jnp.asarray(1e30, dtype))
    order_q = jnp.argsort(qx)
    q_s = query[order_q]
    qx_s = qx[order_q]
    # invalid-query sentinel (2e9) differs from the invalid-ref one (1e9)
    # so a pad query can never sit at distance 0 from a pad ref row
    q_s = jnp.where((qx_s < 1e29)[:, None], q_s, 2e9)
    qx_s = jnp.where(qx_s < 1e29, qx_s, 1e9)

    padM = -(-M // C) * C - M
    q_t = jnp.pad(q_s, ((0, padM), (0, 0)),
                  constant_values=2e9).reshape(-1, C, 3)
    qx_t = jnp.pad(qx_s, (0, padM), constant_values=1e9).reshape(-1, C)

    def per_tile(args):
        q, qx1 = args                                    # (C,3), (C,)
        lo = jnp.min(qx1) - cutoff
        hi = jnp.max(jnp.where(qx1 < 1e8, qx1, -BIG)) + cutoff
        start = jnp.searchsorted(rx_s, lo)
        start = jnp.clip(start, 0, max(N - W, 0)).astype(jnp.int32)
        end_needed = jnp.searchsorted(rx_s, hi, side="right")
        covered = (end_needed - start) <= W
        r = jax.lax.dynamic_slice(
            ref_s, (start, jnp.asarray(0, start.dtype)), (W, 3))  # (W, 3)
        d2 = (jnp.sum(q * q, axis=1, keepdims=True)
              + jnp.sum(r * r, axis=1)[None, :]
              - 2.0 * jax.lax.dot(q, r.T,
                                  precision=jax.lax.Precision.HIGHEST))
        amin = jnp.argmin(d2, axis=1)
        nbr = r[amin]
        best = jnp.sum((q - nbr) ** 2, axis=1)           # exact recompute
        ok = jnp.logical_and(best < cutoff * cutoff, covered)
        idx = jnp.where(ok, order_r[start + amin.astype(jnp.int32)], -1)
        n_unc = jnp.where(covered, 0,
                          jnp.sum((qx1 < 1e8).astype(jnp.int32)))
        return idx.astype(jnp.int32), jnp.where(ok, best, BIG), n_unc

    idx_t, d2_t, unc_t = jax.lax.map(per_tile, (q_t, qx_t))
    idx_sorted = idx_t.reshape(-1)[:M]
    d2_sorted = d2_t.reshape(-1)[:M]
    inv = jnp.zeros(M, jnp.int32).at[order_q].set(
        jnp.arange(M, dtype=jnp.int32))
    return idx_sorted[inv], d2_sorted[inv], jnp.sum(unc_t)


@partial(jax.jit, static_argnames=("k", "window", "query_chunk"))
def knn_window(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
               k: int, window: int = 4096, query_chunk: int = 512,
               query_valid: jnp.ndarray | None = None):
    """Sorted-window k-NN with per-query exactness certificates.

    The scalable neighbourhood search for PCA normals — replaces the
    reference's per-point KD-tree ``getNeighbours(i, 10)``
    (src/internal/frame.cpp:208-242) the same way nn_1_window replaces its
    1-NN queries: each tile of consecutive axis-sorted queries scans one
    contiguous W-row window of the axis-sorted reference cloud, centred on
    the tile's own sorted position (O(M*W) streaming instead of O(M*N)).

    k-NN has no cutoff to bound the guard interval a priori, so exactness
    is certified a posteriori per query: the result is provably the true
    k-NN set iff the k-th found distance is smaller than the distance from
    the query to the window's sorted-axis boundaries (points outside the
    window differ by at least that much along the sort axis alone).

    Returns (idx (M, k) int32 ascending by distance, d2 (M, k),
    exact (M,) bool). Invalid queries return exact=True with junk rows
    (mask downstream, as recompute_normals does).
    """
    M, N = query.shape[0], ref.shape[0]
    dtype = ref.dtype
    W = min(window, N)
    C = query_chunk

    rx, axis = _dominant_axis_coord(ref, ref_valid)
    rx = jnp.where(ref_valid, rx, jnp.asarray(1e30, dtype))
    order_r = jnp.argsort(rx)
    ref_s = ref[order_r]
    rx_s = rx[order_r]
    ref_s = jnp.where((rx_s < 1e29)[:, None], ref_s, 1e9)

    qx = query[:, axis]
    if query_valid is not None:
        qx = jnp.where(query_valid, qx, jnp.asarray(1e30, dtype))
    order_q = jnp.argsort(qx)
    q_s = query[order_q]
    qx_s = qx[order_q]
    q_s = jnp.where((qx_s < 1e29)[:, None], q_s, 2e9)
    qx_s = jnp.where(qx_s < 1e29, qx_s, 1e9)

    padM = -(-M // C) * C - M
    q_t = jnp.pad(q_s, ((0, padM), (0, 0)),
                  constant_values=2e9).reshape(-1, C, 3)
    qx_t = jnp.pad(qx_s, (0, padM), constant_values=1e9).reshape(-1, C)

    from . import nn as nn_mod

    def per_tile(args):
        q, qx1 = args                                    # (C,3), (C,)
        left = jnp.searchsorted(rx_s, qx1[0])
        t_hi = jnp.max(jnp.where(qx1 < 1e8, qx1, -BIG))
        right = jnp.searchsorted(rx_s, t_hi, side="right")
        span = jnp.maximum(right - left, 0)
        start = jnp.clip(left - (W - span) // 2, 0,
                         max(N - W, 0)).astype(jnp.int32)
        r = jax.lax.dynamic_slice(
            ref_s, (start, jnp.asarray(0, start.dtype)), (W, 3))  # (W, 3)
        d2 = nn_mod._chunk_d2(q, r)                       # (C, W)
        neg_d, a_loc = jax.lax.top_k(-d2, k)              # ascending dist
        dists = -neg_d
        idx_sorted = start + a_loc.astype(jnp.int32)      # into sorted ref
        # a-posteriori exactness: the k-th found distance must beat the
        # sorted-axis gap to both window boundaries (strict, tie-safe)
        dk2 = dists[:, -1]
        end = start + W
        b_lo = rx_s[jnp.maximum(start - 1, 0)]
        b_hi = rx_s[jnp.minimum(end, N - 1)]
        gap_lo = qx1 - b_lo
        gap_hi = b_hi - qx1
        ex_lo = jnp.logical_or(
            start == 0,
            jnp.logical_and(gap_lo > 0, dk2 < gap_lo * gap_lo))
        ex_hi = jnp.logical_or(
            end >= N,
            jnp.logical_and(gap_hi > 0, dk2 < gap_hi * gap_hi))
        # invalid/padded queries don't need a certificate
        ex = jnp.logical_or(jnp.logical_and(ex_lo, ex_hi), qx1 >= 1e8)
        return idx_sorted, dists, ex

    idx_t, d2_t, ex_t = jax.lax.map(per_tile, (q_t, qx_t))
    idx_sorted = idx_t.reshape(-1, k)[:M]
    d2_sorted = d2_t.reshape(-1, k)[:M]
    ex_sorted = ex_t.reshape(-1)[:M]
    inv = jnp.zeros(M, jnp.int32).at[order_q].set(
        jnp.arange(M, dtype=jnp.int32))
    return (order_r[idx_sorted][inv], d2_sorted[inv], ex_sorted[inv])


def window_shortfall(query: jnp.ndarray, ref: jnp.ndarray,
                     ref_valid: jnp.ndarray, cutoff: float,
                     query_chunk: int = 512,
                     query_valid: jnp.ndarray | None = None):
    """Max rows any query tile's guard interval spans — the W this
    cloud/tile-size needs for full coverage (cf. nn_grid.max_occupancy).

    Pass ``query_valid`` for ragged clouds: padded query rows otherwise
    read as real far-away queries and inflate the requirement toward N,
    negating the windowed speedup."""
    dtype = ref.dtype
    rx, axis = _dominant_axis_coord(ref, ref_valid)
    rx = jnp.where(ref_valid, rx, jnp.asarray(1e30, dtype))
    rx_s = jnp.sort(rx)
    qx = query[:, axis]
    if query_valid is not None:
        qx = jnp.where(query_valid, qx, jnp.asarray(1e30, dtype))
    qx = jnp.sort(qx)
    M = qx.shape[0]
    C = query_chunk
    padM = -(-M // C) * C - M
    qx_t = jnp.pad(qx, (0, padM), constant_values=1e9).reshape(-1, C)
    lo = jnp.searchsorted(rx_s, qx_t[:, 0] - cutoff)
    hi = jnp.searchsorted(
        rx_s, jnp.max(jnp.where(qx_t < 1e8, qx_t, -BIG), axis=1) + cutoff,
        side="right")
    return jnp.max(hi - lo)
