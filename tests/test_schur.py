"""Schur-complement frame elimination: exactness vs the dense Cholesky
path, independent-set construction, and full-pipeline parity."""
import jax
import jax.numpy as jnp
import numpy as np

from mv_lm_icp_tpu.models import frameset, pipeline
from mv_lm_icp_tpu.solvers import schur
from tests.test_multiview import synthetic_frameset


def _random_spd(key, F):
    """Random SPD [6F,6F] with couplings ONLY on a chain graph (so the
    odd frames form an independent set)."""
    A = 0.01 * jax.random.normal(key, (F * 6, F * 6), jnp.float64)
    H = A @ A.T + jnp.eye(F * 6) * 3.0
    # zero non-chain couplings
    mask = np.zeros((F, F), bool)
    for i in range(F):
        mask[i, i] = True
        if i + 1 < F:
            mask[i, i + 1] = mask[i + 1, i] = True
    M = np.kron(mask, np.ones((6, 6), bool))
    return jnp.where(jnp.asarray(M), H, 0.0)


class TestIndependentSet:
    def test_chain_alternates(self):
        F = 7
        e = np.asarray([[i, i + 1] for i in range(F - 1)])
        elim = schur.independent_set(e, F)
        # no two adjacent eliminated; maximal
        for i in range(F - 1):
            assert not (elim[i] and elim[i + 1])
        assert elim.sum() >= F // 2

    def test_keep_respected(self):
        e = np.asarray([[0, 1], [1, 2]])
        keep = np.asarray([True, False, False])
        elim = schur.independent_set(e, 3, keep=keep)
        assert not elim[0]


class TestSchurSolve:
    def test_matches_dense_cholesky(self):
        F = 8
        key = jax.random.PRNGKey(0)
        H = _random_spd(key, F)
        g = jax.random.normal(jax.random.PRNGKey(1), (F * 6,), jnp.float64)
        elim = np.arange(F) % 2 == 1          # odds: independent on chain
        solve = schur.make_schur_solver(elim)
        d_schur = solve(H, g)
        L = jnp.linalg.cholesky(H)
        d_dense = jax.scipy.linalg.cho_solve((L, True), -g)
        np.testing.assert_allclose(np.asarray(d_schur),
                                   np.asarray(d_dense), rtol=1e-9,
                                   atol=1e-12)

    def test_empty_elimination_is_dense(self):
        F = 3
        H = _random_spd(jax.random.PRNGKey(2), F)
        g = jax.random.normal(jax.random.PRNGKey(3), (F * 6,), jnp.float64)
        solve = schur.make_schur_solver(np.zeros(F, bool))
        L = jnp.linalg.cholesky(H)
        np.testing.assert_allclose(
            np.asarray(solve(H, g)),
            np.asarray(jax.scipy.linalg.cho_solve((L, True), -g)),
            rtol=1e-10)


class TestPipelineParity:
    def test_one_round_matches_cholesky_exactly(self):
        fs = synthetic_frameset(F=5, N=256, sigma=0.03, sigmat=0.02, seed=6)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        cfg = pipeline.ICPConfig(rounds=1, knn=2, cutoff=1.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=256)
        cfg_s = pipeline.enable_schur(cfg, fs, edges)
        assert cfg_s.schur_elim is not None and any(cfg_s.schur_elim)
        fs_a, _, _ = pipeline.icp_round(fs, edges, cfg)
        fs_b, _, _ = pipeline.icp_round(fs, edges, cfg_s)
        # elimination is algebraically exact: one solve agrees to fp noise
        np.testing.assert_allclose(np.asarray(fs_b.poses),
                                   np.asarray(fs_a.poses), atol=1e-12)

    def test_multi_round_converges_equivalently(self):
        """Across re-matching rounds, fp-level solve differences can flip
        NN ties, so trajectories are only statistically identical —
        assert both reach the same optimum."""
        from mv_lm_icp_tpu.utils import metrics

        fs = synthetic_frameset(F=5, N=256, sigma=0.03, sigmat=0.02, seed=6)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        cfg = pipeline.ICPConfig(rounds=4, knn=2, cutoff=1.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=256)
        cfg_s = pipeline.enable_schur(cfg, fs, edges)
        r0 = float(metrics.alignment_rmse(fs))
        fs_a, _ = pipeline.run_icp(fs, cfg)
        fs_b, _ = pipeline.run_icp(fs, cfg_s)
        ra = float(metrics.alignment_rmse(fs_a))
        rb = float(metrics.alignment_rmse(fs_b))
        # fp-level solve differences flip NN ties across rounds, so exact
        # trajectories differ within LM's function_tolerance slack; both
        # must converge equally well
        assert ra < r0 * 0.05 and rb < r0 * 0.05, (r0, ra, rb)
