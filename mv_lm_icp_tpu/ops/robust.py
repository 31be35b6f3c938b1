"""Robust loss functions with Ceres semantics.

TPU-native replacement for ``ceres::SoftLOneLoss(a)`` as used by the
reference's multiview optimizers with the per-edge scale
``a = 1.5 * median(correspondence distances)``
(reference: src/internal/icp-ceres.cpp:283-284, src/internal/frame.cpp:
166-176; flag ``robust``, src/main_multiview.cpp:51).

Ceres convention: a loss acts on the *squared* block norm s = |r|^2 and is
scaled as rho_a(s) = a^2 rho(s / a^2) (ceres loss_function.h):

  SoftLOneLoss(a):  b = a^2,  rho(s)  = 2 b (sqrt(1 + s/b) - 1)
                              rho'(s) = 1 / sqrt(1 + s/b)

The LM solver applies the standard IRLS correction: residuals and Jacobians
are scaled by sqrt(rho'(s)) so that H ~= sum rho' J^T J and
g = sum rho' J^T r (the Triggs second-order term is dropped, as Ceres
itself does whenever it would make the approximation indefinite).
"""
from __future__ import annotations

import jax.numpy as jnp


def trivial(s: jnp.ndarray, scale=None):
    """Identity loss: rho(s) = s, rho'(s) = 1 (robust=false path)."""
    return s, jnp.ones_like(s)


def soft_l1(s: jnp.ndarray, scale) -> tuple:
    """Ceres SoftLOneLoss with scaling parameter ``scale`` (= a).

    Returns (rho(s), rho'(s)); broadcastable ``scale`` supports the per-edge
    robust scales of the multiview problem.
    """
    b = jnp.square(scale)
    b = jnp.maximum(b, jnp.finfo(s.dtype).tiny)
    root = jnp.sqrt(1.0 + s / b)
    return 2.0 * b * (root - 1.0), 1.0 / root


def soft_l1_norm(s: jnp.ndarray, scale) -> tuple:
    """Scale-NORMALIZED soft-L1: the scipy-TRF formulation — residuals
    divided by the robust scale, then unit soft_l1:

        rho(s) = 2 (sqrt(1 + s/a^2) - 1),   rho'(s) = a^-2 / sqrt(1+s/a^2)

    i.e. exactly ``soft_l1 / a^2``. The difference vs Ceres semantics is
    the RELATIVE edge weighting in a multiview problem: here a tightly
    aligned edge (small median scale a) gets ~1/a^2 MORE weight, while
    Ceres' rho_a(s) = a^2 rho(s/a^2) is weight-independent in the
    quadratic regime. On low-overlap scenes (dinosaur, ~14% overlap) the
    normalized form trusts the well-aligned edges and converges ~15%
    closer to the optimum (the round-2 oracle gap, BENCHMARKS.md); the
    reference's Ceres semantics (icp-ceres.cpp:283-284) stay the default.
    """
    b = jnp.square(scale)
    # floor at eps, not finfo.tiny: 1/b is the quadratic-regime weight, so
    # a degenerate scale (e.g. an edge whose matches are all self-matches
    # at distance 0) would otherwise produce ~1/tiny ~ 8.5e37 weights that
    # overflow the f32 Hessian accumulation to inf
    b = jnp.maximum(b, jnp.finfo(s.dtype).eps)
    root = jnp.sqrt(1.0 + s / b)
    return 2.0 * (root - 1.0), (1.0 / b) / root


LOSSES = {"trivial": trivial, "soft_l1": soft_l1,
          "soft_l1_norm": soft_l1_norm}
