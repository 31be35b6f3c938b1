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


LOSSES = {"trivial": trivial, "soft_l1": soft_l1}
