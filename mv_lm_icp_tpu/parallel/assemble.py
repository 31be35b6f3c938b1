"""Assembly of the blocked multiview normal equations, and the
collective-volume accounting for the two distributed exchange modes.

The joint system is block-sparse: a knn-k frame graph has E = O(k*F)
edges, each contributing three 6x6 blocks (H_hh, H_hk, H_kk) and two
6-vectors (g_h, g_k) — O(E) floats — while the dense [6F, 6F] system is
O(F^2). The reference hands Ceres the same block-sparse structure
(SPARSE_NORMAL_CHOLESKY over per-edge residual blocks, reference:
src/internal/icp-ceres.cpp:66-89); the TPU-native distributed analogue
is to move the per-edge blocks through the collectives and assemble the
dense gauge-fixed system replicated on every device, instead of
psum-reducing the dense matrix itself:

- ``comm="blocks"``: psum partial blocks over the point axis (same edge
  keys on every member), all_gather the per-edge blocks over the edge
  axis, assemble densely on-device. Per-LM-iteration volume O(E).
- ``comm="dense"``: scatter blocks into [6F, 6F] locally and psum the
  dense system. Per-LM-iteration volume O(F^2). Simpler, and fine for
  small F; kept for A/B.

Crossover: blocks wins once 120*E < 36*F^2 + 6*F (120 floats per edge,
BLOCK_FLOATS_PER_EDGE below) — for the default knn=2 ring (E = 2F) that
is every F >= 7.
"""
from __future__ import annotations

import jax.numpy as jnp

BLOCK_FLOATS_PER_EDGE = 3 * 36 + 2 * 6   # H_hh, H_hk, H_kk + g_h, g_k


def assemble_dense(F: int, src, dst, g_h, g_k, H_hh, H_hk, H_kk):
    """Scatter-add [E]-keyed per-edge blocks into the dense system.

    Args are per-edge: src/dst [E] int frame keys, g_* [E, 6],
    H_* [E, 6, 6]. Returns (G [F, 6], H [F, 6, F, 6]). H_kh is the
    transpose of H_hk (the system is symmetric), so only H_hk travels.
    """
    dtype = g_h.dtype
    G = jnp.zeros((F, 6), dtype).at[src].add(g_h).at[dst].add(g_k)
    H = jnp.zeros((F, 6, F, 6), dtype)
    H = H.at[src, :, src, :].add(H_hh)
    H = H.at[dst, :, dst, :].add(H_kk)
    H = H.at[src, :, dst, :].add(H_hk)
    H = H.at[dst, :, src, :].add(jnp.swapaxes(H_hk, -1, -2))
    return G, H


def collective_floats(F: int, E: int, mode: str) -> int:
    """Floats moved through the solve collectives per LM iteration
    (excluding the scalar cost psum)."""
    if mode == "blocks":
        return E * BLOCK_FLOATS_PER_EDGE
    if mode == "dense":
        return (6 * F) * (6 * F) + 6 * F
    raise ValueError(f"unknown comm mode {mode!r}")
