"""Pallas TPU kernel: sorted-window 1-NN with scalar-prefetched starts.

The large-cloud correspondence kernel — the Pallas version of
:mod:`mv_lm_icp_tpu.ops.nn_window` (see that module for the
exactness-within-cutoff argument, and SURVEY §7.3.2 for why the KD-tree
is replaced by sorted windows rather than a gather-based grid hash).

Where the brute-force kernel (kernels/nn_pallas.py) scans EVERY
reference column for every query tile, this kernel scans only a W-row
window of the axis-sorted reference cloud around each query tile's own
sorted position:

- grid = (edges, query_tiles, window_tiles). The third axis streams the
  window's (1, 1, td) reference blocks through VMEM via the automatic
  pipeline; a scalar-prefetch array ``starts[e, qtile]`` (in td units)
  tells the BlockSpec index_map WHERE each tile's window begins — the
  TPU-native replacement for data-dependent tree traversal.
- the running per-lane-class (min d2, block index) carry lives in VMEM
  scratch, persisting across the window_tiles grid axis; the output tile
  is written on the last step after one lexicographic cross-lane
  resolution (round-5 fused-merge structure, see kernels/nn_pallas.py).
- work per query is O(W) instead of O(N): at the large-scene shapes
  (8 frames x 61k-245k pts, W = 4-8k) that is a 10-60x FLOP cut with
  the same pure-VPU inner loop as the brute kernel.

Everything here is the kernel + its launch; sorting, start computation,
coverage masks and index unsorting are XLA-side in ops/nn_window's
``nn_1_window_batch`` wrapper below.
"""
from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nn_pallas import _I0, SENTINEL


@flax.struct.dataclass
class RefSort:
    """Sorted-axis index of a batch of reference clouds — the windowed
    backend's analogue of the reference's per-frame KD-tree, and like it
    REUSABLE: destination clouds are pose-invariant in their local
    frames, so the reference builds each frame's tree once, lazily, and
    keeps it for all 20 rounds (``if(indexComputed) return``,
    src/internal/frame.cpp:187-206). Build this once per run with
    :func:`sort_ref_batch` (or per frame via models/frameset.sort_cache)
    and pass it to the batch entry points; without it they re-argsort
    every destination cloud on every call, which round 4's roofline
    measured as the windowed path's dominant cost (~30 sort passes over
    M per call, BENCHMARKS.md)."""
    axis: jnp.ndarray      # (B,) int32 dominant sort axis per cloud
    order: jnp.ndarray     # (B, N) int32 argsort along that axis
    coord_s: jnp.ndarray   # (B, N) f32 sorted axis coords (invalid: 1e30)
    points_s: jnp.ndarray  # (B, N, 3) f32 sorted, SENTINEL on invalid


def sort_ref_batch(ref: jnp.ndarray, ref_valid: jnp.ndarray) -> RefSort:
    """Sort each cloud along its dominant (largest-extent) axis."""
    dtype = jnp.float32
    ref = ref.astype(dtype)
    big = jnp.asarray(1e30, dtype)
    lo3 = jnp.min(jnp.where(ref_valid[..., None], ref, big), axis=1)
    hi3 = jnp.max(jnp.where(ref_valid[..., None], ref, -big), axis=1)
    axis = jnp.argmax(hi3 - lo3, axis=-1)                  # (B,)
    rx = jnp.take_along_axis(ref, axis[:, None, None], axis=2)[..., 0]
    rx = jnp.where(ref_valid, rx, big)
    order_r = jnp.argsort(rx, axis=1)                      # (B, N)
    rx_s = jnp.take_along_axis(rx, order_r, axis=1)
    ref_s = jnp.take_along_axis(ref, order_r[..., None], axis=1)
    ref_s = jnp.where((rx_s < 1e29)[..., None], ref_s, SENTINEL)
    return RefSort(axis=axis, order=order_r, coord_s=rx_s, points_s=ref_s)


def _sort_queries(query: jnp.ndarray, rs: RefSort, query_valid):
    """Sort queries along the ref's axis. Invalid-query coord sentinel
    must differ from the invalid-REF one, else a pad query sits at
    distance 0 from a pad ref row and "matches" it."""
    dtype = jnp.float32
    query = query.astype(dtype)
    big = jnp.asarray(1e30, dtype)
    qx = jnp.take_along_axis(query, rs.axis[:, None, None], axis=2)[..., 0]
    if query_valid is not None:
        qx = jnp.where(query_valid, qx, big)
    order_q = jnp.argsort(qx, axis=1)
    qx_s = jnp.take_along_axis(qx, order_q, axis=1)
    q_s = jnp.take_along_axis(query, order_q[..., None], axis=1)
    q_s = jnp.where((qx_s < 1e29)[..., None], q_s, 2.0 * SENTINEL)
    qx_s = jnp.where(qx_s < 1e29, qx_s, big)
    return q_s, qx_s, order_q


def _self_queries(rs: RefSort):
    """Query set == reference set (the PCA-normal neighbourhood case):
    reuse the ref sort instead of a second argsort."""
    sent = rs.coord_s >= 1e29
    q_s = jnp.where(sent[..., None], 2.0 * SENTINEL, rs.points_s)
    return q_s, rs.coord_s, rs.order


def _kernel(starts_ref, qx_ref, qy_ref, qz_ref, rx_ref, ry_ref, rz_ref,
            idx_ref, d2_ref, best_d, best_i, *, td: int):
    """One (edge, query-tile, window-tile) step.

    q*_ref: (TQ, 1) sorted-query coordinate columns
    r*_ref: (1, 1, td) the current window block of sorted-ref rows
    idx_ref: (1, 1, TQ) output argmin (element index into sorted ref)
    d2_ref: (1, 1, TQ) output exact squared distance of the winner
    best_d/best_i: (TQ, 128) VMEM scratch carried across window tiles —
      per-LANE-CLASS running (min d2, 128-row block index), the same
      fused-merge structure as the brute kernel (kernels/nn_pallas.py,
      round 5): each 128-column block costs one compare + two selects
      instead of a jnp.min + jnp.argmin pass, and the full lexicographic
      (d2, index) cross-lane resolution runs ONCE at flush.
    """
    e = pl.program_id(0)
    i = pl.program_id(1)
    w = pl.program_id(2)
    nc = td // 128

    @pl.when(w == 0)
    def _init():
        best_d[...] = jnp.full_like(best_d[...], jnp.inf)
        best_i[...] = jnp.zeros_like(best_i[...])

    qx, qy, qz = qx_ref[...], qy_ref[...], qz_ref[...]
    tq = qx.shape[0]
    # window tiles arrive in ascending sorted position, so ties keep the
    # first (lowest-index) block — XLA-argmin first-index semantics
    base = (starts_ref[e, i] + w) * nc
    bd, bb = best_d[...], best_i[...]
    for c in range(nc):
        cs = slice(c * 128, (c + 1) * 128)
        dx = qx - rx_ref[0, 0:1, cs]
        dy = qy - ry_ref[0, 0:1, cs]
        dz = qz - rz_ref[0, 0:1, cs]
        d2c = dx * dx + dy * dy + dz * dz       # (TQ, 128)
        keep = bd <= d2c
        bd = jnp.where(keep, bd, d2c)
        bb = jnp.where(keep, bb, base + c)
    best_d[...] = bd
    best_i[...] = bb

    @pl.when(w == pl.num_programs(2) - 1)
    def _flush():
        lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
        d = best_d[...]
        gi = best_i[...] * 128 + lane
        for shift in (64, 32, 16, 8, 4, 2, 1):
            od = pltpu.roll(d, shift, axis=1)
            oi = pltpu.roll(gi, shift, axis=1)
            take = (d < od) | ((d == od) & (gi <= oi))
            d = jnp.where(take, d, od)
            gi = jnp.where(take, gi, oi)
        idx_ref[0, ...] = gi[:, 0:1].T
        d2_ref[0, ...] = d[:, 0:1].T


@functools.partial(jax.jit,
                   static_argnames=("window", "tq", "td", "interpret"))
def nn_window_sorted(q_sorted: jnp.ndarray, ref_sorted: jnp.ndarray,
                     starts_td: jnp.ndarray, window: int = 4096,
                     tq: int = 512, td: int = 2048,
                     interpret: bool | None = None):
    """Launch the window kernel on PRE-SORTED inputs.

    Args:
      q_sorted: (E, M, 3) queries sorted per edge by the sort axis; padded
        queries carry SENTINEL coords.
      ref_sorted: (E, N, 3) references sorted per edge; padded/invalid rows
        carry SENTINEL coords and sort to the end. N must leave room for
        any start: starts are pre-clamped to (Npad - window) / td.
      starts_td: (E, M/tq) int32 window starts in td units (scalar
        prefetch).
      window: W rows scanned per query tile (multiple of td).

    Returns idx (E, M) int32 — element index into the SORTED ref.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    E, M = q_sorted.shape[:2]
    N = ref_sorted.shape[1]
    assert window % td == 0 and M % tq == 0 and N % td == 0
    npq = M // tq
    nw = window // td

    qcols = tuple(q_sorted[..., i].reshape(E * M, 1) for i in range(3))
    rrows = tuple(ref_sorted[..., i][:, None, :] for i in range(3))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E, npq, nw),
        in_specs=[pl.BlockSpec((tq, 1),
                               lambda e, i, w, s: (e * npq + i, _I0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, 1, td),
                        lambda e, i, w, s: (e, _I0, s[e, i] + w),
                        memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((1, 1, tq),
                                lambda e, i, w, s: (e, _I0, i),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((tq, 128), jnp.float32),
                        pltpu.VMEM((tq, 128), jnp.int32)],
    )
    idx, d2 = pl.pallas_call(
        functools.partial(_kernel, td=td),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, 1, M), jnp.int32),
                   jax.ShapeDtypeStruct((E, 1, M), jnp.float32)],
        interpret=interpret,
    )(starts_td, *qcols, *rrows)
    return idx[:, 0, :], d2[:, 0, :]


def _kkernel(starts_ref, qx_ref, qy_ref, qz_ref, rx_ref, ry_ref, rz_ref,
             idx_ref, d2_ref, best_d, best_i, *, td: int, k: int):
    """k-NN window step: extract the k smallest distances of this
    (query-tile x window-tile) block in ascending order and merge each
    into the running sorted top-k scratch by vectorized insertion.

    Scratch best_d/best_i: (TQ, k), ascending along k. Inserting an
    arbitrary candidate stream one-by-one into a sorted top-k register
    file is order-independent, so per tile only its k smallest need
    extracting. Cost per tile ~ k * 3 passes over (TQ, td) vs the
    1-NN kernel's 1 pass — still pure VPU, no gathers.
    """
    e = pl.program_id(0)
    i = pl.program_id(1)
    w = pl.program_id(2)

    @pl.when(w == 0)
    def _init():
        best_d[...] = jnp.full_like(best_d[...], jnp.inf)
        best_i[...] = jnp.zeros_like(best_i[...])

    qx, qy, qz = qx_ref[...], qy_ref[...], qz_ref[...]
    tq = qx.shape[0]
    nc = td // 128
    dx = qx - rx_ref[0]                        # (TQ, td)
    dy = qy - ry_ref[0]
    dz = qz - rz_ref[0]
    d2 = dx * dx + dy * dy + dz * dz
    offset = (starts_ref[e, i] + w) * td
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    bd, bi = best_d[...], best_i[...]          # (TQ, k)
    for _ in range(k):
        # per-128-block fused (min d2, block) merge + one lexicographic
        # cross-lane resolve per pass — replaces jnp.min + jnp.argmin
        # (same structure as the 1-NN kernels, round 5; ties resolve to
        # the first index exactly like XLA argmin)
        md = jnp.full((tq, 128), jnp.inf, jnp.float32)
        mb = jnp.zeros((tq, 128), jnp.int32)
        for c in range(nc):
            d2c = d2[:, c * 128:(c + 1) * 128]
            take = md <= d2c
            md = jnp.where(take, md, d2c)
            mb = jnp.where(take, mb, c)
        gi = mb * 128 + lane
        for shift in (64, 32, 16, 8, 4, 2, 1):
            od = pltpu.roll(md, shift, axis=1)
            oi = pltpu.roll(gi, shift, axis=1)
            take = (md < od) | ((md == od) & (gi <= oi))
            md = jnp.where(take, md, od)
            gi = jnp.where(take, gi, oi)
        loc_d = md[:, 0:1]                                 # (TQ, 1)
        loc_a = gi[:, 0:1]
        d2 = jnp.where(col == loc_a, jnp.inf, d2)
        # insertion: regs > candidate shift right; the first such reg
        # takes the candidate. The shifted mask lives in f32, not bool:
        # Mosaic cannot concatenate i1 vregs on real TPUs ("Invalid
        # vector register cast", bitcast_vreg 8x128xi1 -> i32).
        gt = bd > loc_d                                    # (TQ, k)
        gt_f = gt.astype(jnp.float32)
        gt_prev_f = jnp.concatenate(
            [jnp.zeros_like(gt_f[:, :1]), gt_f[:, :-1]], axis=1)
        first = jnp.logical_and(gt, gt_prev_f == 0.0)
        sh_d = jnp.concatenate([bd[:, :1], bd[:, :-1]], axis=1)
        sh_i = jnp.concatenate([bi[:, :1], bi[:, :-1]], axis=1)
        bd = jnp.where(gt, jnp.where(first, loc_d, sh_d), bd)
        bi = jnp.where(gt, jnp.where(first, loc_a + offset, sh_i), bi)
    best_d[...] = bd
    best_i[...] = bi

    @pl.when(w == pl.num_programs(2) - 1)
    def _flush():
        idx_ref[0, ...] = best_i[...]
        d2_ref[0, ...] = best_d[...]


@functools.partial(jax.jit,
                   static_argnames=("k", "window", "tq", "td", "interpret"))
def knn_window_sorted(q_sorted: jnp.ndarray, ref_sorted: jnp.ndarray,
                      starts_td: jnp.ndarray, k: int = 10,
                      window: int = 4096, tq: int = 512, td: int = 2048,
                      interpret: bool | None = None):
    """Launch the k-NN window kernel on PRE-SORTED inputs (same contract
    as :func:`nn_window_sorted`, but k results per query, ascending).

    Returns (idx (E, M, k) int32 into the SORTED ref, d2 (E, M, k)).
    td=4096 amortizes the per-pass cross-lane resolve best on v5e
    (measured 100.2 -> 80.5 ms/frame at the 247k-point large-scene
    shape; td=8192 exceeds VMEM)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    E, M = q_sorted.shape[:2]
    N = ref_sorted.shape[1]
    assert window % td == 0 and M % tq == 0 and N % td == 0
    npq = M // tq
    nw = window // td

    qcols = tuple(q_sorted[..., i].reshape(E * M, 1) for i in range(3))
    rrows = tuple(ref_sorted[..., i][:, None, :] for i in range(3))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(E, npq, nw),
        in_specs=[pl.BlockSpec((tq, 1),
                               lambda e, i, w, s: (e * npq + i, _I0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, 1, td),
                        lambda e, i, w, s: (e, _I0, s[e, i] + w),
                        memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((1, tq, k),
                                lambda e, i, w, s: (e, i, _I0),
                                memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((tq, k), jnp.float32),
                        pltpu.VMEM((tq, k), jnp.int32)],
    )
    idx, d2 = pl.pallas_call(
        functools.partial(_kkernel, td=td, k=k),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((E, M, k), jnp.int32),
                   jax.ShapeDtypeStruct((E, M, k), jnp.float32)],
        interpret=interpret,
    )(starts_td, *qcols, *rrows)
    return idx, d2


@functools.partial(jax.jit,
                   static_argnames=("k", "window", "tq", "td", "interpret",
                                    "self_query"))
def knn_window_batch(query: jnp.ndarray, ref: jnp.ndarray,
                     ref_valid: jnp.ndarray, k: int = 10,
                     window: int = 4096, tq: int = 512, td: int = 4096,
                     interpret: bool | None = None,
                     query_valid: jnp.ndarray | None = None,
                     ref_sort: RefSort | None = None,
                     self_query: bool = False):
    """Batched sorted-window k-NN, Pallas kernel — the tuned version of
    ops.nn_window.knn_window (reference ``getNeighbours(i, 10)``,
    src/internal/frame.cpp:208-242), for PCA normal neighbourhoods at
    large-scene sizes.

    query (E, M, 3), ref (E, N, 3), ref_valid (E, N) ->
    (idx (E, M, k) int32 ascending by distance, d2 (E, M, k),
    exact (E, M) bool a-posteriori certificates: True iff the k-th
    found distance beats the sorted-axis gap to both window boundaries
    — points outside the window differ at least that much along the
    sort axis alone. Invalid queries certify True with junk rows (mask
    downstream via ref_valid[idx], as recompute_normals does).

    ``ref_sort``: precomputed :class:`RefSort` of (ref, ref_valid) —
    the build-index-once amortization. ``self_query=True`` declares
    query==ref AND query_valid==ref_valid (the PCA neighbourhood case),
    reusing the ref sort instead of a second argsort.
    """
    E, M = query.shape[:2]
    N = ref.shape[1]
    window = -(-window // td) * td
    dtype = jnp.float32
    big = jnp.asarray(1e30, dtype)

    if ref_sort is None:
        ref_sort = sort_ref_batch(ref, ref_valid)
    order_r, rx_s, ref_s = ref_sort.order, ref_sort.coord_s, \
        ref_sort.points_s
    if self_query:
        q_s, qx_s, order_q = _self_queries(ref_sort)
    else:
        q_s, qx_s, order_q = _sort_queries(query, ref_sort, query_valid)

    Mp = -(-M // tq) * tq
    W = min(window, -(-N // td) * td)
    Np = max(-(-N // td) * td, W)
    q_pad = jnp.full((E, Mp, 3), 2.0 * SENTINEL, dtype).at[:, :M].set(q_s)
    qx_pad = jnp.full((E, Mp), big, dtype).at[:, :M].set(qx_s)
    ref_pad = jnp.full((E, Np, 3), SENTINEL, dtype).at[:, :N].set(ref_s)
    rx_pad = jnp.full((E, Np), big, dtype).at[:, :N].set(rx_s)

    # center each tile's window on its own sorted span (k-NN has no
    # cutoff to bound the interval a priori; exactness is certified
    # a posteriori instead)
    tiles = qx_pad.reshape(E, Mp // tq, tq)
    t_hi = jnp.max(jnp.where(tiles < 1e29, tiles, -big), axis=-1)
    left = jax.vmap(jnp.searchsorted)(rx_pad, tiles[..., 0])
    right = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="right"))(rx_pad, t_hi)
    span = jnp.maximum(right - left, 0)
    start_el = jnp.clip(left - (W - span) // 2, 0, Np - W)
    starts_td = (start_el // td).astype(jnp.int32)

    idx_sorted, d2 = knn_window_sorted(q_pad, ref_pad, starts_td, k=k,
                                       window=W, tq=tq, td=td,
                                       interpret=interpret)
    idx_sorted = idx_sorted[:, :M]
    d2 = d2[:, :M]

    # a-posteriori certificates (ops/nn_window.knn_window semantics)
    start_act = jnp.repeat(starts_td * td, tq, axis=1)[:, :M]  # (E, M)
    end_act = start_act + W
    b_lo = jnp.take_along_axis(rx_pad, jnp.maximum(start_act - 1, 0),
                               axis=1)
    b_hi = jnp.take_along_axis(rx_pad, jnp.minimum(end_act, Np - 1),
                               axis=1)
    dk2 = d2[..., -1]
    gap_lo = qx_s - b_lo
    gap_hi = b_hi - qx_s
    ex_lo = jnp.logical_or(
        start_act == 0,
        jnp.logical_and(gap_lo > 0, dk2 < gap_lo * gap_lo))
    ex_hi = jnp.logical_or(
        end_act >= N,
        jnp.logical_and(gap_hi > 0, dk2 < gap_hi * gap_hi))
    exact = jnp.logical_or(jnp.logical_and(ex_lo, ex_hi), qx_s >= 1e29)

    # back to original indexing, unsort queries
    safe = jnp.clip(idx_sorted, 0, N - 1)
    idx = jnp.take_along_axis(order_r, safe.reshape(E, M * k),
                              axis=1).reshape(E, M, k)
    inv_q = jnp.argsort(order_q, axis=1)
    return (jnp.take_along_axis(idx, inv_q[..., None], axis=1),
            jnp.take_along_axis(d2, inv_q[..., None], axis=1),
            jnp.take_along_axis(exact, inv_q, axis=1))


@functools.partial(jax.jit,
                   static_argnames=("window", "tq", "td", "interpret"))
def nn_1_window_batch(query: jnp.ndarray, ref: jnp.ndarray,
                      ref_valid: jnp.ndarray, cutoff,
                      window: int = 8192, tq: int = 512, td: int = 2048,
                      interpret: bool | None = None,
                      query_valid: jnp.ndarray | None = None,
                      ref_sort: RefSort | None = None):
    """Batched exact-within-cutoff 1-NN over all edges, windowed kernel.

    Same contract as ops.nn_window.nn_1_window, batched: query (E, M, 3),
    ref (E, N, 3), ref_valid (E, N) -> (idx (E, M) int32 with -1 for
    unmatched/unprovable, d2 (E, M) with +inf there, uncovered (E,) int32
    count of valid queries whose tile's guard interval exceeded W — 0
    means the within-cutoff exactness proof held for every real query).

    ``query_valid`` (E, M) marks real queries; invalid (padding) rows are
    moved to the sentinel BEFORE sorting so they can't widen a boundary
    tile's coverage interval (see ops.nn_window.nn_1_window).

    ``ref_sort``: precomputed :class:`RefSort` of (ref, ref_valid) —
    destination clouds are pose-invariant, so the pipeline builds this
    once per run (frame.cpp:187-206's build-index-once amortization) and
    only the query sort remains per call.

    Window starts are floored to td-row granularity, so the coverage
    guarantee is ``window - td`` rows per query tile: size ``window`` at
    least ``window_shortfall(...) + td`` (rounded up to a td multiple).
    td=2048 measured fastest on v5e (71 ms for 16 edges x 61k pts at
    W=4096 vs 107 ms at td=512).
    """
    E, M = query.shape[:2]
    N = ref.shape[1]
    window = -(-window // td) * td        # round up to kernel granularity
    dtype = jnp.float32
    cutoff = jnp.asarray(cutoff, dtype)
    big = jnp.asarray(1e30, dtype)

    if ref_sort is None:
        ref_sort = sort_ref_batch(ref, ref_valid)
    order_r, rx_s, ref_s = ref_sort.order, ref_sort.coord_s, \
        ref_sort.points_s
    q_s, qx_s, order_q = _sort_queries(query, ref_sort, query_valid)

    # pad shapes to kernel granularity
    Mp = -(-M // tq) * tq
    W = min(window, -(-N // td) * td)
    Np = max(-(-N // td) * td, W)
    q_pad = jnp.full((E, Mp, 3), 2.0 * SENTINEL, dtype).at[:, :M].set(q_s)
    qx_pad = jnp.full((E, Mp), big, dtype).at[:, :M].set(qx_s)
    ref_pad = jnp.full((E, Np, 3), SENTINEL, dtype).at[:, :N].set(ref_s)
    rx_pad = jnp.full((E, Np), big, dtype).at[:, :N].set(rx_s)

    # per query tile: window start (td units) + coverage check
    tiles = qx_pad.reshape(E, Mp // tq, tq)
    t_lo = tiles[..., 0] - cutoff                          # sorted: col 0=min
    t_hi = jnp.max(jnp.where(tiles < 1e29, tiles, -big), axis=-1) + cutoff
    starts_el = jax.vmap(jnp.searchsorted)(rx_pad, t_lo)   # (E, ntiles)
    ends_el = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="right"))(rx_pad, t_hi)
    starts_td = jnp.clip(starts_el // td, 0, (Np - W) // td).astype(jnp.int32)
    covered = (ends_el - starts_td * td) <= W              # (E, ntiles)
    n_real = jnp.sum((tiles < 1e29).astype(jnp.int32), axis=-1)
    uncovered = jnp.sum(jnp.where(covered, 0, n_real), axis=-1)  # (E,)

    idx_sorted, d2 = nn_window_sorted(q_pad, ref_pad, starts_td, window=W,
                                      tq=tq, td=td, interpret=interpret)
    idx_sorted = idx_sorted[:, :M]
    d2 = d2[:, :M]      # kernel d2 is already the exact f32 distance

    # back to original ref indexing + masks
    safe = jnp.clip(idx_sorted, 0, N - 1)
    idx = jnp.take_along_axis(order_r, safe, axis=1)
    cov_q = jnp.repeat(covered, tq, axis=1)[:, :M]
    ok = jnp.logical_and(jnp.logical_and(d2 < cutoff * cutoff, cov_q),
                         idx_sorted < N)
    idx = jnp.where(ok, idx, -1).astype(jnp.int32)
    d2 = jnp.where(ok, d2, jnp.inf)

    # unsort queries
    inv_q = jnp.argsort(order_q, axis=1)
    return (jnp.take_along_axis(idx, inv_q, axis=1),
            jnp.take_along_axis(d2, inv_q, axis=1),
            uncovered)
