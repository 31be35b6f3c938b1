"""Pallas TPU kernel: tiled brute-force 1-nearest-neighbour search.

The hand-tuned replacement for nanoflann's KD-tree queries (reference:
include/nanoflann.hpp via Frame::getClosestPoint, src/internal/frame.cpp:
187-206) — see SURVEY §3.4. A tree is pointer-chasing; the TPU shape is a
tiled distance computation with a running argmin.

Design (measured on v5e; see BENCHMARKS.md):

- **Pure VPU, no matmul.** The textbook `|q|^2+|r|^2-2q.r` cross term is
  a (TQ,3)x(3,TD) matmul whose K dimension wastes 97% of the MXU's 128
  contraction lanes; at the full-f32 precision the argmin needs (a single
  bf16 pass mis-ranks ~99% of neighbours on real scans) it measured
  2.5 ms per 16.7k^2 search. Computing the squared differences directly —
  query coords broadcast down sublanes, ref coords across lanes,
  `dx*dx+dy*dy+dz*dz` — is exact f32 on the VPU and measured 0.96 ms.
- grid: one program per (edge, query tile); the ref cloud's coordinate
  rows stay VMEM-resident and a fori_loop walks TD-column tiles keeping a
  running (min, argmin).
- masking: invalid/padded points carry sentinel coordinates (1e9) and can
  never win the argmin; winners' distances are recomputed exactly
  elementwise outside the kernel (also returning +inf for queries whose
  winner is invalid — i.e. no valid ref at all).

Exactness is tested against the jnp reference (ops/nn.nn_1) in
tests/test_nn_pallas.py; on CPU the same kernel runs in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = 1e9
# x64-safe index-map zero: a literal 0 traces as i64 under
# jax_enable_x64, which Mosaic cannot legalize
_I0 = np.int32(0)


def _kernel(qx_ref, qy_ref, qz_ref, rx_ref, ry_ref, rz_ref, idx_ref,
            d2_ref, *, td: int):
    """One query tile vs the whole reference cloud.

    q*_ref: (TQ, 1) query coordinate columns (sublane-major)
    r*_ref: (1, Np) ref coordinate rows (lane-major)
    idx_ref: (1, TQ) output argmin indices
    d2_ref: (1, TQ) the winner's exact squared distance (the kernel's
      direct squared differences ARE exact f32 — outputting them saves
      the wrapper an E*M random neighbour gather per call; sentinel
      winners carry ~1e18 and the wrapper maps them to +inf)

    Round-5 restructure (VERDICT r4 #2): the original body ran
    jnp.min + jnp.argmin per (TQ, TD) tile — the argmin's
    compare-and-select tree tripled the per-pair op count past the 8
    charged flops (~31% VPU). Instead each 128-lane column block merges
    into a per-LANE-CLASS running (min d2, first block index) carry with
    one compare + two selects, and the cross-lane resolution — the only
    place a full lexicographic (d2, index) compare is needed — happens
    ONCE per query tile as a 7-step rotate-reduce after the sweep.
    Tie semantics are exactly XLA argmin's first-index: the sequential
    block merge keeps the earlier block on equal d2, and the final
    lex-min keeps the smallest global index among equal-distance lanes.
    """
    qx, qy, qz = qx_ref[...], qy_ref[...], qz_ref[...]
    tq = qx.shape[0]
    n_tiles = rx_ref.shape[1] // td
    nc = td // 128

    def body(t, carry):
        best_d, best_b = carry
        # ONE dynamic lane-slice per td-tile (a per-128-column dynamic
        # slice measured 2x slower — Mosaic charges dynamic lane offsets
        # every iteration); the 128-column merge below uses free static
        # sub-slices of the materialized tile
        sl = pl.ds(pl.multiple_of(t * td, td), td)
        dx = qx - rx_ref[:, sl]                     # (TQ, td)
        dy = qy - ry_ref[:, sl]
        dz = qz - rz_ref[:, sl]
        d2 = dx * dx + dy * dy + dz * dz
        base = t * nc
        for c in range(nc):
            d2c = d2[:, c * 128:(c + 1) * 128]
            keep = best_d <= d2c                    # ties keep 1st block
            best_d = jnp.where(keep, best_d, d2c)
            best_b = jnp.where(keep, best_b, base + c)
        return best_d, best_b

    init = (jnp.full((tq, 128), jnp.inf, jnp.float32),
            jnp.zeros((tq, 128), jnp.int32))
    best_d, best_b = jax.lax.fori_loop(0, n_tiles, body, init)

    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    gidx = best_b * 128 + lane
    # cross-lane lexicographic (d2, index) rotate-reduce: lex-min is
    # associative/commutative, so after log2(128) rotation steps every
    # lane carries the global (min d2, smallest index at that d2)
    for shift in (64, 32, 16, 8, 4, 2, 1):
        od = pltpu.roll(best_d, shift, axis=1)
        oi = pltpu.roll(gidx, shift, axis=1)
        keep = (best_d < od) | ((best_d == od) & (gidx <= oi))
        best_d = jnp.where(keep, best_d, od)
        gidx = jnp.where(keep, gidx, oi)
    idx_ref[...] = gidx[:, 0:1].T
    d2_ref[...] = best_d[:, 0:1].T


def _prep(query, ref, ref_valid, tq, td):
    """Pad + split into kernel layout: 3x (..., Mp, 1) and 3x (..., 1, Np)."""
    dtype = jnp.float32
    M, N = query.shape[-2], ref.shape[-2]
    Mp = -(-M // tq) * tq
    Np = -(-N // td) * td
    batch = query.shape[:-2]
    q = jnp.full(batch + (Mp, 3), SENTINEL, dtype)
    q = q.at[..., :M, :].set(query.astype(dtype))
    r = jnp.full(batch + (Np, 3), SENTINEL, dtype)
    r = r.at[..., :N, :].set(
        jnp.where(ref_valid[..., None], ref, SENTINEL).astype(dtype))
    qcols = tuple(q[..., :, i:i + 1] for i in range(3))         # (Mp, 1)
    rrows = tuple(r[..., :, i][..., None, :] for i in range(3))  # (1, Np)
    return qcols, rrows, Mp, Np


# any real match is far below this; a sentinel-coordinate winner (no
# valid ref at all) computes d2 ~ (1e9)^2 and maps to +inf
_NO_MATCH_D2 = 1e17


@functools.partial(jax.jit,
                   static_argnames=("tq", "td", "interpret"))
def nn_1(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
         tq: int = 512, td: int = 4096, interpret: bool | None = None):
    """Exact 1-NN: same contract as ops.nn.nn_1 (idx (M,), d2 (M,)).

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    kernel is testable on the CPU backend.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    M = query.shape[0]
    qcols, rrows, Mp, Np = _prep(query, ref, ref_valid, tq, td)
    grid = (Mp // tq,)
    idx, d2 = pl.pallas_call(
        functools.partial(_kernel, td=td),
        grid=grid,
        in_specs=[pl.BlockSpec((tq, 1), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, Np), lambda i: (_I0, _I0),
                        memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((1, tq), lambda i: (_I0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, Mp), jnp.int32),
                   jax.ShapeDtypeStruct((1, Mp), jnp.float32)],
        interpret=interpret,
    )(*qcols, *rrows)
    idx = idx[0, :M]
    d2 = d2[0, :M]
    return idx, jnp.where(d2 < _NO_MATCH_D2, d2, jnp.inf)


def _batch_kernel(qx_ref, qy_ref, qz_ref, rx_ref, ry_ref, rz_ref,
                  idx_ref, d2_ref, *, td: int):
    """Batched body: query tiles come in flat (E*Mp, 1) layout (2D blocks
    tile better than batch-of-1 3D blocks — measured ~4% faster), ref rows
    and outputs keep the per-edge leading axis."""
    _kernel(qx_ref, qy_ref, qz_ref,
            rx_ref.at[0], ry_ref.at[0], rz_ref.at[0],
            idx_ref.at[0], d2_ref.at[0], td=td)


@functools.partial(jax.jit, static_argnames=("tq", "td", "interpret"))
def nn_1_batch(query: jnp.ndarray, ref: jnp.ndarray,
               ref_valid: jnp.ndarray, tq: int = 512, td: int = 4096,
               interpret: bool | None = None):
    """Batched exact 1-NN: one kernel launch for all E edges.

    Args: query (E, M, 3); ref (E, N, 3); ref_valid (E, N).
    Returns (idx (E, M) int32, d2 (E, M)).

    This is the all-edges correspondence search of the multiview pipeline
    (SURVEY §3.4) as a single Pallas grid (E, M/tq) — no per-edge launch
    overhead, sequential-grid reuse of each edge's VMEM-resident cloud.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    E, M = query.shape[0], query.shape[1]
    qcols, rrows, Mp, Np = _prep(query, ref, ref_valid, tq, td)
    qflat = tuple(q.reshape(E * Mp, 1) for q in qcols)
    npq = Mp // tq
    grid = (E, npq)
    idx, d2 = pl.pallas_call(
        functools.partial(_batch_kernel, td=td),
        grid=grid,
        in_specs=[pl.BlockSpec((tq, 1),
                               lambda e, i: (e * npq + i, _I0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((1, 1, Np), lambda e, i: (e, _I0, _I0),
                        memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((1, 1, tq), lambda e, i: (e, _I0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((E, 1, Mp), jnp.int32),
                   jax.ShapeDtypeStruct((E, 1, Mp), jnp.float32)],
        interpret=interpret,
    )(*qflat, *rrows)
    idx = idx[:, 0, :M]
    d2 = d2[:, 0, :M]
    return idx, jnp.where(d2 < _NO_MATCH_D2, d2, jnp.inf)
