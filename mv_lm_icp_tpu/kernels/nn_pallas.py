"""Pallas TPU kernel: tiled brute-force 1-nearest-neighbour search.

The hand-tuned replacement for nanoflann's KD-tree queries (reference:
include/nanoflann.hpp via Frame::getClosestPoint, src/internal/frame.cpp:
187-206) — see SURVEY §3.4. A tree is pointer-chasing; the TPU shape is a
tiled distance computation:

  layout   coordinates are stored transposed and sublane-padded, (8, N):
           the point axis rides the 128-wide lanes, the 3 coordinate rows
           pad to the 8-sublane f32 tile (rows 3..7 are zero and contribute
           nothing to dot products).
  grid     one program per (edge, query tile).
  body     the reference cloud stays VMEM-resident; a fori_loop walks ref
           tiles of TD columns. The argmin is computed over the *relative*
           squared distance d' = |r|^2 - 2 q.r — the per-query |q|^2 term
           is constant along the reduction axis and cannot change the
           argmin, so the only per-element VPU work after the MXU cross
           term (with the -2 pre-folded into the ref operand) is a single
           broadcast add. Exact distances for the winners are recomputed
           elementwise outside the kernel (O(N), exact f32).
  masking  invalid/padded points carry sentinel coordinates (1e9), so
           their |r|^2 ~ 1e18 can never win — no mask operand in the hot
           loop.

The cross term runs at full f32 precision: a single bf16 MXU pass (the TPU
default for f32 matmuls) has ~1e-2 relative error, far larger than real
point spacings squared — measured to corrupt 99% of argmins on the Bunny
scans. Exactness is tested against the jnp reference (ops/nn.nn_1) in
tests/test_nn_pallas.py; on CPU the same kernel runs in interpreter mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = 1e9


def _kernel(qT_ref, rT2_ref, rn2_ref, idx_ref, *, td: int):
    """One query tile vs the whole reference cloud.

    qT_ref:  (8, TQ)  query coords (rows 3..7 zero)
    rT2_ref: (8, Np)  ref coords pre-multiplied by -2
    rn2_ref: (1, Np)  ref squared norms
    idx_ref: (1, TQ)  output argmin indices
    """
    qT = qT_ref[...]
    tq = qT.shape[1]
    n_ref = rT2_ref.shape[1]
    n_tiles = n_ref // td

    def body(t, carry):
        best_d, best_i = carry
        rT2 = rT2_ref[:, pl.ds(t * td, td)]          # (8, TD)
        rn2 = rn2_ref[:, pl.ds(t * td, td)]          # (1, TD)
        cross = jax.lax.dot_general(
            qT, rT2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                            # (TQ, TD) = -2 q.r
        d2 = cross + rn2                             # relative distance
        loc_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None]
        loc_d = jnp.min(d2, axis=1)[:, None]
        loc_i = loc_arg + t * td
        take = loc_d < best_d
        return (jnp.where(take, loc_d, best_d),
                jnp.where(take, loc_i, best_i))

    init = (jnp.full((tq, 1), jnp.inf, jnp.float32),
            jnp.zeros((tq, 1), jnp.int32))
    _, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    idx_ref[...] = best_i.T                          # (1, TQ)


def _prep(query, ref, ref_valid, tq, td):
    """Pad + transpose into kernel layout. Returns qT, rT2, rn2, dims."""
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
    qT = jnp.zeros(batch + (8, Mp), dtype)
    qT = qT.at[..., :3, :].set(jnp.swapaxes(q, -1, -2))
    rT2 = jnp.zeros(batch + (8, Np), dtype)
    rT2 = rT2.at[..., :3, :].set(-2.0 * jnp.swapaxes(r, -1, -2))
    rn2 = jnp.sum(r * r, axis=-1)[..., None, :]      # (..., 1, Np)
    return qT, rT2, rn2, Mp, Np


def _exact_d2(query, ref, ref_valid, idx):
    """Exact squared distance to the chosen neighbour, +inf if invalid."""
    nbr = jnp.take_along_axis(ref, idx[..., None], axis=-2)
    d2 = jnp.sum((query.astype(jnp.float32)
                  - nbr.astype(jnp.float32)) ** 2, axis=-1)
    ok = jnp.take_along_axis(ref_valid, idx, axis=-1)
    return jnp.where(ok, d2, jnp.inf)


@functools.partial(jax.jit,
                   static_argnames=("tq", "td", "interpret"))
def nn_1(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
         tq: int = 512, td: int = 2048, interpret: bool | None = None):
    """Exact 1-NN: same contract as ops.nn.nn_1 (idx (M,), d2 (M,)).

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    kernel is testable on the CPU backend.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    M = query.shape[0]
    qT, rT2, rn2, Mp, Np = _prep(query, ref, ref_valid, tq, td)
    grid = (Mp // tq,)
    idx = pl.pallas_call(
        functools.partial(_kernel, td=td),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Mp), jnp.int32),
        interpret=interpret,
    )(qT, rT2, rn2)
    idx = idx[0, :M]
    return idx, _exact_d2(query, ref, ref_valid, idx)


def _batch_kernel(qT_ref, rT2_ref, rn2_ref, idx_ref, *, td: int):
    _kernel(qT_ref.at[0], rT2_ref.at[0], rn2_ref.at[0], idx_ref.at[0],
            td=td)


@functools.partial(jax.jit, static_argnames=("tq", "td", "interpret"))
def nn_1_batch(query: jnp.ndarray, ref: jnp.ndarray,
               ref_valid: jnp.ndarray, tq: int = 512, td: int = 2048,
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
    qT, rT2, rn2, Mp, Np = _prep(query, ref, ref_valid, tq, td)
    grid = (E, Mp // tq)
    idx = pl.pallas_call(
        functools.partial(_batch_kernel, td=td),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, tq), lambda e, i: (e, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Np), lambda e, i: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda e, i: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq), lambda e, i: (e, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, 1, Mp), jnp.int32),
        interpret=interpret,
    )(qT, rT2, rn2)
    idx = idx[:, 0, :M]
    return idx, _exact_d2(query, ref, ref_valid, idx)
