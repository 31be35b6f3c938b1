"""Grid-hash nearest-neighbour search: O(N·K) instead of O(N^2), jnp.

The second NN strategy from SURVEY §7.2.3 (brute force first, "then
grid-hash variant") and the device-side analogue of the native CPU grid
(native/mvicp_host.cpp). Exact *within the cutoff radius*: like the
correspondence pipeline itself (frame.cpp:156-160 discards dist >=
cutoff), a neighbour farther than one cell is reported as invalid
(idx -1 semantics -> here: d2 = +inf), which is precisely what the ICP
pipeline consumes.

Fixed-shape, sort-based formulation (no dynamic structures, jit/vmap
friendly):

1. every reference point hashes its cell coords (cell == cutoff) into a
   static table of H buckets (spatial hashing — table size independent of
   scene extent; collisions only ADD candidates, never lose them),
2. reference points are sorted by bucket id; bucket extents come from a
   vectorized searchsorted over the sorted ids,
3. each query gathers up to K candidates from each of its 27 neighbouring
   cells' buckets and reduces exact distances.

K (``k_per_cell``) caps bucket occupancy: a bucket holding more points
than K has its tail truncated (possible miss). ``max_occupancy`` reports
the true maximum so callers can validate K against their data — the
pipeline's clouds at ICP cutoffs sit far below the default.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PRIMES = (73856093, 19349663, 83492791)


def _bucket_of(cells: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial hash of integer cell coords (..., 3) -> bucket id.

    Forced int32 so the wrap-around is identical no matter what width the
    caller's cell arithmetic promoted to (x64 mode would otherwise hash
    query and reference cells differently).
    """
    cells = cells.astype(jnp.int32)
    primes = jnp.asarray(_PRIMES, jnp.int32)
    h = (cells[..., 0] * primes[0]) ^ (cells[..., 1] * primes[1]) \
        ^ (cells[..., 2] * primes[2])
    return jnp.abs(h).astype(jnp.int32) % table_size


def max_occupancy(ref: jnp.ndarray, ref_valid: jnp.ndarray, cell: float,
                  table_size: int | None = None):
    """Largest bucket population for this cloud/cell — validates K."""
    if table_size is None:
        table_size = _next_pow2(ref.shape[0])
    return _max_occupancy(ref, ref_valid, cell, table_size)


@partial(jax.jit, static_argnames=("table_size",))
def _max_occupancy(ref: jnp.ndarray, ref_valid: jnp.ndarray, cell: float,
                   table_size: int):
    cells = jnp.floor(ref / cell).astype(jnp.int32)
    b = jnp.where(ref_valid, _bucket_of(cells, table_size), table_size)
    counts = jnp.zeros(table_size + 1, jnp.int32).at[b].add(1)
    return jnp.max(counts[:table_size])


def _next_pow2(n: int) -> int:
    return 1 << max(10, (n - 1).bit_length())


def nn_1_grid(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
              cell: float, k_per_cell: int = 128,
              table_size: int | None = None, query_chunk: int | None = None):
    """1-NN exact within ``cell``; (idx (M,), d2 (M,)) with d2=inf beyond.

    Cost per query: 27 * k_per_cell candidate distances, independent of N.
    ``table_size`` defaults to the next power of two >= N — fewer buckets
    than points piles unrelated cells into one bucket by hash collision
    and silently raises the occupancy that ``k_per_cell`` must cover.
    ``query_chunk`` defaults so the (chunk, 27, K, 3) candidate gather
    stays under ~64 MB.
    """
    if table_size is None:
        table_size = _next_pow2(ref.shape[0])
    if query_chunk is None:
        query_chunk = max(64, min(2048, (1 << 22) // (27 * k_per_cell)))
    return _nn_1_grid(query, ref, ref_valid, cell, k_per_cell=k_per_cell,
                      table_size=table_size, query_chunk=query_chunk)


@partial(jax.jit, static_argnames=("k_per_cell", "table_size",
                                   "query_chunk"))
def _nn_1_grid(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
               cell: float, k_per_cell: int, table_size: int,
               query_chunk: int):
    M, N = query.shape[0], ref.shape[0]
    dtype = ref.dtype
    big = jnp.asarray(jnp.inf, dtype)

    cells_r = jnp.floor(ref / cell).astype(jnp.int32)
    bucket_r = jnp.where(ref_valid, _bucket_of(cells_r, table_size),
                         table_size)
    order = jnp.argsort(bucket_r)
    ref_sorted = ref[order]
    bucket_sorted = bucket_r[order]
    starts = jnp.searchsorted(bucket_sorted,
                              jnp.arange(table_size + 1, dtype=jnp.int32))

    # 27-neighbourhood offsets
    o = jnp.arange(-1, 2)
    offs = jnp.stack(jnp.meshgrid(o, o, o, indexing="ij"),
                     axis=-1).reshape(27, 3)

    pad = -(-M // query_chunk) * query_chunk - M
    qpad = jnp.pad(query, ((0, pad), (0, 0)))
    qc = qpad.reshape(-1, query_chunk, 3)

    def per_chunk(q):
        cells_q = jnp.floor(q / cell).astype(jnp.int32)       # (C, 3)
        nb = cells_q[:, None, :] + offs[None, :, :]           # (C, 27, 3)
        b = _bucket_of(nb, table_size)                        # (C, 27)
        s = starts[b]                                         # (C, 27)
        e = starts[b + 1]
        # candidate slots: s + 0..K-1, masked by < e
        slot = s[..., None] + jnp.arange(k_per_cell)          # (C, 27, K)
        ok = slot < e[..., None]
        slot = jnp.clip(slot, 0, N - 1)
        cand = ref_sorted[slot]                               # (C, 27, K, 3)
        d2 = jnp.sum((q[:, None, None, :] - cand) ** 2, axis=-1)
        d2 = jnp.where(ok, d2, big)
        d2f = d2.reshape(q.shape[0], -1)
        amin = jnp.argmin(d2f, axis=1)
        best_d = jnp.take_along_axis(d2f, amin[:, None], axis=1)[:, 0]
        best_slot = jnp.take_along_axis(
            slot.reshape(q.shape[0], -1), amin[:, None], axis=1)[:, 0]
        idx = order[best_slot]
        # beyond one cell -> not exact -> report unmatched
        inval = best_d > jnp.asarray(cell, dtype) ** 2
        return (jnp.where(inval, -1, idx).astype(jnp.int32),
                jnp.where(inval, big, best_d))

    idx, d2 = jax.lax.map(per_chunk, qc)
    return idx.reshape(-1)[:M], d2.reshape(-1)[:M]
