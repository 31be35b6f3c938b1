"""Iterative linear solves for the frame-graph normal equations:
preconditioned conjugate gradients, optionally on the Schur-reduced
system.

The reference's Windows configuration solves the multiview system with
``ITERATIVE_SCHUR`` + ``SCHUR_JACOBI`` (reference:
src/internal/icp-ceres.cpp:76-80) — conjugate gradients on the reduced
camera system with a block-diagonal preconditioner — instead of a direct
sparse factorization. The TPU equivalents here plug into
``lm_solve(linear_solve=...)`` exactly like the dense-Schur option
(solvers/schur.py):

- :func:`make_pcg_solver` — CG on the damped [6F, 6F] system with a
  6x6 block-Jacobi preconditioner (the SCHUR_JACOBI analogue for a pure
  pose graph, whose "camera" blocks are the per-frame 6x6 diagonal).
  Per iteration: one [6F, 6F] matvec (MXU) + one batched 6x6 triangular
  solve. For bounded-degree graphs the matvec is the only O(F^2) term,
  and it replaces the O(F^3) Cholesky — the crossover where this wins
  on-chip is measured in benchmarks/linsolve_ab.py.
- ``elim=...`` — independent-set Schur elimination FIRST (exact, as in
  solvers/schur.py), then PCG on the reduced |K|-frame system: the
  ITERATIVE_SCHUR composition. The reduction is exact, so accuracy is
  set purely by the CG tolerance.

CG on an SPD damped Gauss-Newton system is itself exact in arithmetic;
``tol``/``maxiter`` bound the residual. LM is robust to inexact steps
(the trust region rejects bad ones), so loose tolerances trade linear-
solve time for (at most) extra LM iterations — Ceres ships the same
trade under ``min/max_linear_solver_iterations``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def _block_jacobi(H6F: jnp.ndarray, F: int):
    """Factor the (F, 6, 6) diagonal blocks; returns apply(r) -> M^-1 r."""
    blocks = H6F.reshape(F, 6, F, 6)[jnp.arange(F), :, jnp.arange(F), :]
    L = jnp.linalg.cholesky(blocks)

    def apply(r):
        r6 = r.reshape(F, 6)
        z = jax.vmap(lambda Li, bi: jax.scipy.linalg.cho_solve(
            (Li, True), bi))(L, r6)
        return z.reshape(F * 6)

    return apply


def pcg(matvec, precond, b, tol: float, maxiter: int):
    """Preconditioned CG for SPD systems, as one ``lax.while_loop``.

    Solves A x = b to ||r|| <= tol * ||b|| or ``maxiter`` iterations
    (whichever first). Returns x.
    """
    bnorm2 = jnp.dot(b, b)
    stop2 = (tol * tol) * bnorm2
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    rz0 = jnp.dot(r0, z0)

    def cond(carry):
        _, r, _, _, k = carry
        return jnp.logical_and(k < maxiter, jnp.dot(r, r) > stop2)

    def body(carry):
        x, r, p, rz, k = carry
        Ap = matvec(p)
        pAp = jnp.dot(p, Ap)
        alpha = rz / jnp.where(pAp > 0, pAp, jnp.finfo(b.dtype).tiny)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.dot(r, z)
        beta = rz_new / jnp.where(rz > 0, rz, jnp.finfo(b.dtype).tiny)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.asarray(0, jnp.int32)))
    return x


def make_pcg_solver(tol: float = 1e-8, maxiter: int | None = None,
                    elim: np.ndarray | None = None):
    """Build ``solve(H_damped, g) -> delta`` for ``lm_solve``.

    Args:
      tol: relative residual target (Ceres eta analogue).
      maxiter: CG iteration cap (default 6F — CG converges exactly in
        the system dimension in arithmetic).
      elim: optional CONCRETE [F] bool mask from
        ``schur.independent_set`` — eliminate those frames exactly first
        and run PCG on the reduced system (ITERATIVE_SCHUR).
    """
    if elim is None:
        def solve(H, g):
            T = g.shape[0]
            F = T // 6
            mi = maxiter if maxiter is not None else T
            precond = _block_jacobi(H, F)
            matvec = lambda p: H @ p
            return pcg(matvec, precond, -g, tol, mi)

        return solve

    elim = np.asarray(elim, bool)
    F = elim.shape[0]
    s_idx = np.nonzero(elim)[0]
    k_idx = np.nonzero(~elim)[0]
    Ns, Nk = len(s_idx), len(k_idx)
    if Ns == 0:
        return make_pcg_solver(tol=tol, maxiter=maxiter)
    s_j = jnp.asarray(s_idx)
    k_j = jnp.asarray(k_idx)

    def solve(H, g):
        # identical exact reduction to schur.make_schur_solver, then CG
        # on the reduced SPD system instead of a dense Cholesky
        H6 = H.reshape(F, 6, F, 6)
        g6 = g.reshape(F, 6)
        Hss = H6[s_j, :, s_j, :]
        Hks = H6[k_j][:, :, s_j].transpose(0, 2, 1, 3)
        Hsk = H6[s_j][:, :, k_j].transpose(0, 2, 1, 3)
        Hkk = H6[k_j][:, :, k_j].transpose(0, 2, 1, 3)
        g_s = g6[s_j]
        g_k = g6[k_j]

        Lss = jnp.linalg.cholesky(Hss)
        cho = lambda L, B: jax.scipy.linalg.cho_solve((L, True), B)
        inv_gs = jax.vmap(cho)(Lss, g_s)
        rhs = Hsk.transpose(0, 2, 1, 3).reshape(Ns, 6, Nk * 6)
        inv_Hsk = jax.vmap(cho)(Lss, rhs).reshape(Ns, 6, Nk, 6)
        red = jnp.einsum("ksab,sbld->klad", Hks, inv_Hsk, precision=_HI)
        Hred = (Hkk - red).transpose(0, 2, 1, 3).reshape(Nk * 6, Nk * 6)
        g_red = (g_k - jnp.einsum("ksab,sb->ka", Hks, inv_gs,
                                  precision=_HI)).reshape(Nk * 6)

        mi = maxiter if maxiter is not None else Nk * 6
        precond = _block_jacobi(Hred, Nk)
        d_k = pcg(lambda p: Hred @ p, precond, -g_red, tol, mi)
        d_k6 = d_k.reshape(Nk, 6)
        rhs_s = -g_s - jnp.einsum("skab,kb->sa", Hsk, d_k6, precision=_HI)
        d_s = jax.vmap(cho)(Lss, rhs_s)
        delta6 = jnp.zeros((F, 6), dtype=H.dtype)
        delta6 = delta6.at[s_j].set(d_s).at[k_j].set(d_k6)
        return delta6.reshape(F * 6)

    return solve
