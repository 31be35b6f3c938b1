"""Pallas TPU kernel: tiled brute-force 1-nearest-neighbour search.

The hand-tuned replacement for nanoflann's KD-tree queries (reference:
include/nanoflann.hpp via Frame::getClosestPoint, src/internal/frame.cpp:
187-206) — see SURVEY §3.4. A tree is pointer-chasing; the TPU shape is a
tiled distance computation:

  layout   coordinates are stored transposed and sublane-padded, (8, N):
           the point axis rides the 128-wide lanes, the 3 coordinate rows
           pad to the 8-sublane f32 tile (rows 3..7 are zero and contribute
           nothing to dot products).
  grid     one program per query tile (TQ lanes of queries).
  body     the reference cloud stays VMEM-resident; a fori_loop walks ref
           tiles of TD columns, computing the (TQ, TD) squared-distance
           block as  |q|^2 + |r|^2 - 2 q.r  with the cross term on the MXU
           at full f32 precision (a single bf16 pass corrupts argmins — see
           ops/nn.py), and folds a running (min, argmin) in VMEM scratch.
  masking  invalid/padded points carry sentinel coordinates (1e9), so
           their distances are ~1e18 and can never win the argmin — no
           separate mask operand needed in the hot loop.

Exactness is tested against the jnp reference (ops/nn.nn_1) in
tests/test_nn_pallas.py; on CPU the same kernel runs in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = 1e9


def _kernel(qT_ref, rT_ref, idx_ref, d2_ref, *, td: int):
    """One query tile vs the whole reference cloud."""
    qT = qT_ref[...]                      # (8, TQ)
    tq = qT.shape[1]
    n_ref = rT_ref.shape[1]
    qn = jnp.sum(qT * qT, axis=0)[:, None]          # (TQ, 1)

    n_tiles = n_ref // td

    def body(t, carry):
        best_d, best_i = carry
        rT = rT_ref[:, pl.ds(t * td, td)]            # (8, TD)
        rn = jnp.sum(rT * rT, axis=0)[None, :]       # (1, TD)
        cross = jax.lax.dot_general(
            qT, rT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                            # (TQ, TD)
        d2 = jnp.maximum(qn + rn - 2.0 * cross, 0.0)
        loc_d = jnp.min(d2, axis=1)[:, None]         # (TQ, 1)
        loc_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
        loc_i = loc_arg + t * td
        take = loc_d < best_d
        return (jnp.where(take, loc_d, best_d),
                jnp.where(take, loc_i, best_i))

    init = (jnp.full((tq, 1), jnp.inf, jnp.float32),
            jnp.zeros((tq, 1), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    idx_ref[...] = best_i.T                          # (1, TQ)
    d2_ref[...] = best_d.T


def _batch_kernel(qT_ref, rT_ref, idx_ref, d2_ref, *, td: int):
    """(edge, query-tile) grid: refs carry a leading singleton edge dim."""
    _kernel(qT_ref.at[0], rT_ref.at[0], idx_ref.at[0], d2_ref.at[0], td=td)


@functools.partial(jax.jit, static_argnames=("tq", "td", "interpret"))
def nn_1_batch(query: jnp.ndarray, ref: jnp.ndarray,
               ref_valid: jnp.ndarray, tq: int = 512, td: int = 1024,
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
    N = ref.shape[1]
    dtype = jnp.float32

    Mp = -(-M // tq) * tq
    Np = -(-N // td) * td
    q = jnp.full((E, Mp, 3), SENTINEL, dtype).at[:, :M].set(
        query.astype(dtype))
    r = jnp.full((E, Np, 3), SENTINEL, dtype).at[:, :N].set(
        jnp.where(ref_valid[..., None], ref, SENTINEL).astype(dtype))
    qT = jnp.zeros((E, 8, Mp), dtype).at[:, :3].set(
        jnp.swapaxes(q, 1, 2))
    rT = jnp.zeros((E, 8, Np), dtype).at[:, :3].set(
        jnp.swapaxes(r, 1, 2))

    grid = (E, Mp // tq)
    idx, d2 = pl.pallas_call(
        functools.partial(_batch_kernel, td=td),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tq), lambda e, i: (e, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Np), lambda e, i: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tq), lambda e, i: (e, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tq), lambda e, i: (e, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((E, 1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((E, 1, Mp), jnp.float32),
        ],
        interpret=interpret,
    )(qT, rT)
    return idx[:, 0, :M], d2[:, 0, :M]


@functools.partial(jax.jit,
                   static_argnames=("tq", "td", "interpret"))
def nn_1(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
         tq: int = 512, td: int = 1024, interpret: bool | None = None):
    """Exact 1-NN: same contract as ops.nn.nn_1 (idx (M,), d2 (M,)).

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    kernel is testable on the CPU backend.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    M, N = query.shape[0], ref.shape[0]
    dtype = jnp.float32

    Mp = -(-M // tq) * tq
    Np = -(-N // td) * td
    q = jnp.full((Mp, 3), SENTINEL, dtype).at[:M].set(
        query.astype(dtype))
    r = jnp.full((Np, 3), SENTINEL, dtype).at[:N].set(
        jnp.where(ref_valid[:, None], ref, SENTINEL).astype(dtype))
    # transpose + pad coordinate rows to the 8-sublane f32 tile
    qT = jnp.zeros((8, Mp), dtype).at[:3].set(q.T)
    rT = jnp.zeros((8, Np), dtype).at[:3].set(r.T)

    grid = (Mp // tq,)
    idx, d2 = pl.pallas_call(
        functools.partial(_kernel, td=td),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Mp), jnp.int32),
            jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        ],
        interpret=interpret,
    )(qT, rT)
    return idx[0, :M], d2[0, :M]
