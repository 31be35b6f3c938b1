"""PCG / ITERATIVE_SCHUR linear-solve parity vs the dense Cholesky path
(reference: icp-ceres.cpp:76-80 ITERATIVE_SCHUR + SCHUR_JACOBI)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.solvers import pcg as pcg_mod
from mv_lm_icp_tpu.solvers import schur as schur_mod


def _ring_system(F=32, seed=0, dtype=jnp.float64):
    """A damped SPD [6F, 6F] system with ring-graph block sparsity —
    the shape the multiview normal equations take (knn=2)."""
    rng = np.random.default_rng(seed)
    H = np.zeros((F, 6, F, 6))
    for i in range(F):
        A = rng.normal(size=(8, 6))
        H[i, :, i, :] += A.T @ A + 6 * np.eye(6)
        j = (i + 1) % F
        B = rng.normal(size=(6, 6)) * 0.3
        H[i, :, j, :] += B
        H[j, :, i, :] += B.T
    Hm = H.reshape(6 * F, 6 * F)
    Hm = 0.5 * (Hm + Hm.T)
    g = rng.normal(size=6 * F)
    return jnp.asarray(Hm, dtype), jnp.asarray(g, dtype)


def _edges_ring(F):
    i = np.arange(F)
    return np.stack([np.concatenate([i, i]),
                     np.concatenate([(i + 1) % F, (i - 1) % F])], axis=1)


class TestPCG:
    @pytest.mark.parametrize("F", [8, 64])
    def test_matches_dense(self, F):
        H, g = _ring_system(F)
        want = jnp.linalg.solve(H, -g)
        solve = pcg_mod.make_pcg_solver(tol=1e-12)
        got = jax.jit(solve)(H, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-7, atol=1e-9)

    def test_iterative_schur_matches_dense(self):
        F = 32
        H, g = _ring_system(F, seed=1)
        want = jnp.linalg.solve(H, -g)
        elim = schur_mod.independent_set(_edges_ring(F), F)
        assert elim.any() and not elim.all()
        solve = pcg_mod.make_pcg_solver(tol=1e-12, elim=elim)
        got = jax.jit(solve)(H, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-7, atol=1e-9)

    def test_maxiter_caps(self):
        """A loose cap still returns a finite descent direction."""
        H, g = _ring_system(16, seed=2)
        solve = pcg_mod.make_pcg_solver(tol=0.0, maxiter=5)
        got = jax.jit(solve)(H, g)
        assert np.isfinite(np.asarray(got)).all()
        # descent: g . delta < 0
        assert float(jnp.dot(g, got)) < 0


class TestEndToEnd:
    def test_solve_multiview_pcg_parity(self):
        """Full joint LM solve with the PCG linear solver lands on the
        dense path's poses (the VERDICT r4 #7 'parity vs dense' bar)."""
        from mv_lm_icp_tpu.models import correspond, frameset
        from mv_lm_icp_tpu.ops import se3
        from mv_lm_icp_tpu.solvers import lm as lm_mod
        from mv_lm_icp_tpu.solvers import multiview as mv

        rng = np.random.default_rng(5)
        Fn, N = 6, 64
        base = rng.normal(size=(N, 3)).astype(np.float32)
        nor = rng.normal(size=(N, 3)).astype(np.float32)
        nor /= np.linalg.norm(nor, axis=-1, keepdims=True)
        gt = [jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)]
        for _ in range(1, Fn):
            tau = jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)
            gt.append(se3.compose(gt[-1], se3.exp(tau)))
        gt = jnp.stack(gt)
        noisy = jnp.stack([gt[0]] + [
            se3.boxplus(gt[i],
                        jnp.asarray(rng.normal(size=6) * 0.02, jnp.float32))
            for i in range(1, Fn)])
        inv_gt = jax.vmap(se3.inverse)(gt)
        pts = jax.vmap(lambda g: se3.apply(g, jnp.asarray(base)))(inv_gt)
        nrm = jax.vmap(lambda g: se3.rotate_only(g, jnp.asarray(nor)))(
            inv_gt)
        fs = frameset.FrameSet(
            points=pts, normals=nrm, valid=jnp.ones((Fn, N), bool),
            poses=noisy, gt_poses=gt,
            fixed=jnp.asarray(np.arange(Fn) == 0))
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, 1.0, chunk=64)
        cfg = lm_mod.LMConfig(max_iterations=8)
        fs_d, _ = mv.solve_multiview(fs, edges, corr, config=cfg,
                                     assembly="einsum")
        fs_p, _ = mv.solve_multiview(fs, edges, corr, config=cfg,
                                     assembly="einsum", pcg_iters=200)
        np.testing.assert_allclose(np.asarray(fs_p.poses),
                                   np.asarray(fs_d.poses),
                                   rtol=1e-5, atol=1e-6)
