"""Pose-graph (g2o-equivalent) solver: GICP information semantics, pairwise
round-trips, multiview chi2 loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.models import correspond, frameset
from mv_lm_icp_tpu.ops import se3
from mv_lm_icp_tpu.solvers import posegraph
from mv_lm_icp_tpu.utils import metrics
from tests.test_multiview import synthetic_frameset


class TestInformationMatrix:
    def test_prec0_formula(self):
        """W = nn^T + e(I - nn^T) == R0^T diag(e,e,1) R0 with R0 row2=n."""
        rng = np.random.default_rng(0)
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        e = 0.01
        W = np.outer(n, n) + e * (np.eye(3) - np.outer(n, n))
        # eigen-decomposition check: eigenvalue 1 along n, e orthogonal
        np.testing.assert_allclose(W @ n, n, atol=1e-12)
        t = np.cross(n, [1.0, 0, 0])
        t /= np.linalg.norm(t)
        np.testing.assert_allclose(W @ t, e * t, atol=1e-12)


class TestPairwiseGICP:
    def test_p2pt_recovers_gt(self):
        key = jax.random.PRNGKey(0)
        src = jax.random.normal(key, (400, 3), jnp.float64)
        gt = se3.exp(jnp.asarray([0.3, -0.2, 0.4, 0.3, -0.2, 0.5],
                                 jnp.float64))
        dst = se3.apply(gt, src)
        est, stats = posegraph.solve_pairwise_gicp(src, dst)
        dt, dr = se3.pose_diff(gt, est)
        assert float(dt) < 1e-9
        assert float(dr) < 1e-5

    def test_p2pl_recovers_gt(self):
        key = jax.random.PRNGKey(1)
        src = jax.random.normal(key, (400, 3), jnp.float64)
        nor = jax.random.normal(jax.random.PRNGKey(2), (400, 3), jnp.float64)
        nor = nor / jnp.linalg.norm(nor, axis=-1, keepdims=True)
        gt = se3.exp(jnp.asarray([0.2, 0.1, -0.3, 0.2, 0.4, -0.1],
                                 jnp.float64))
        dst = se3.apply(gt, src)
        nor_dst = se3.rotate_only(gt, nor)
        est, _ = posegraph.solve_pairwise_gicp(src, dst, nor_dst,
                                               point_to_plane=True)
        dt, dr = se3.pose_diff(gt, est)
        # anisotropic information still pins the pose with dense normals
        assert float(dt) < 1e-7
        assert float(dr) < 1e-4


class TestMultiviewPoseGraph:
    def test_chi2_decreases_and_converges(self):
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=11)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                               chunk=128)
        rmse0 = metrics.alignment_rmse(fs)
        fs2, hist = posegraph.solve_posegraph(fs, edges, corr,
                                              point_to_plane=True)
        # chi2 non-increasing
        assert all(hist[i + 1] <= hist[i] * (1 + 1e-6)
                   for i in range(len(hist) - 1))
        # stagnation break kicks in well before 100 rounds
        assert len(hist) < 100
        rmse1 = metrics.alignment_rmse(fs2)
        assert rmse1 < rmse0

    def test_gauge_fixed(self):
        fs = synthetic_frameset(F=3, N=128, sigma=0.02, sigmat=0.01, seed=12)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                               chunk=128)
        fs2, _ = posegraph.solve_posegraph(fs, edges, corr, outer_rounds=3)
        np.testing.assert_array_equal(np.asarray(fs2.poses[0]),
                                      np.asarray(fs.poses[0]))

    def test_full_icp_with_posegraph_backend(self):
        """Alternate correspondences <-> posegraph solve (the FLAGS_g2o
        path of the outer loop, main_multiview.cpp:162-163)."""
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.015,
                                seed=13)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        for _ in range(4):
            corr = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                                   chunk=128)
            fs, _ = posegraph.solve_posegraph(fs, edges, corr,
                                              outer_rounds=5)
        dt, dr = se3.pose_diff(fs.poses, fs.gt_poses)
        assert float(jnp.max(dt)) < 1e-4, np.asarray(dt)


class TestFusedPoseGraph:
    """The lax.while_loop chi2 outer loop must reproduce the host-driven
    loop exactly (same stagnation semantics, icp-g2o.cpp:261-303)."""

    def test_fused_matches_host_loop(self):
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=11)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                               chunk=128)
        fs_host, hist_host = posegraph.solve_posegraph(
            fs, edges, corr, point_to_plane=True)
        fs_fused, hist_fused, rounds = posegraph.solve_posegraph_fused(
            fs, edges, corr, point_to_plane=True)
        rounds = int(rounds)
        assert rounds == len(hist_host)
        np.testing.assert_allclose(np.asarray(hist_fused[:rounds]),
                                   np.asarray(hist_host), rtol=1e-6)
        assert np.isnan(np.asarray(hist_fused[rounds:])).all()
        np.testing.assert_allclose(np.asarray(fs_fused.poses),
                                   np.asarray(fs_host.poses), atol=1e-7)

    def test_fused_gauge_fixed(self):
        fs = synthetic_frameset(F=3, N=128, sigma=0.02, sigmat=0.01, seed=12)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                               chunk=128)
        fs2, _, _ = posegraph.solve_posegraph_fused(fs, edges, corr,
                                                    outer_rounds=3)
        np.testing.assert_array_equal(np.asarray(fs2.poses[0]),
                                      np.asarray(fs.poses[0]))

    def test_tr_carry_makes_stagnant_rounds_free(self):
        """After the productive inner solve, the carried (collapsed /
        rejected-out) trust region must terminate re-solves in ~1
        iteration instead of a fresh rejection cascade."""
        from mv_lm_icp_tpu.solvers import lm as lm_mod

        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=11)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                               chunk=128)
        cfg = lm_mod.LMConfig(max_iterations=100,
                              max_consecutive_rejections=10)
        fs1, chi_a, stats = posegraph.solve_posegraph_once(
            fs, edges, corr, config=cfg)
        fs2, chi_b, stats2 = posegraph.solve_posegraph_once(
            fs1, edges, corr, config=cfg,
            tr_state=(stats.radius, stats.decrease_factor))
        # continuation from a finished solve must not undo its result
        assert float(chi_b) <= float(chi_a) * (1 + 1e-6)
        # and must be nearly free: the fresh-restart path burns a full
        # rejection cascade here (>= 10 iterations)
        assert int(stats2.iterations) <= 2
        _, _, stats3 = posegraph.solve_posegraph_once(
            fs1, edges, corr, config=cfg)
        assert int(stats3.iterations) >= int(stats2.iterations)


class TestFusedGICPDriver:
    """pipeline.run_gicp_fused — the whole 20-round alternation fused —
    must reproduce the host composition of find_correspondences +
    solve_posegraph_fused bit-exactly."""

    def test_matches_host_composition(self):
        from mv_lm_icp_tpu.models import pipeline

        fs0 = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02,
                                 seed=21)
        cfg = pipeline.ICPConfig(rounds=3, knn=2, cutoff=1.0, nn_chunk=128)
        fs = fs0
        edges = frameset.knn_pose_graph(fs.poses, 2)
        host_chis = []
        for _ in range(3):
            corr = correspond.find_correspondences(fs, edges, 1.0,
                                                   chunk=128)
            fs, hist, rounds = posegraph.solve_posegraph_fused(fs, edges,
                                                               corr)
            host_chis.append(float(hist[int(rounds) - 1]))
        fs2, chis, unc = pipeline.run_gicp_fused(fs0, cfg)
        np.testing.assert_array_equal(np.asarray(fs2.poses),
                                      np.asarray(fs.poses))
        np.testing.assert_allclose(np.asarray(chis), np.asarray(host_chis),
                                   rtol=1e-6)
        assert int(jnp.sum(unc)) == 0

    def test_point_to_point_metric(self):
        from mv_lm_icp_tpu.models import pipeline
        from mv_lm_icp_tpu.utils import metrics

        fs0 = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02,
                                 seed=22)
        cfg = pipeline.ICPConfig(rounds=4, knn=2, cutoff=1.0, nn_chunk=128,
                                 metric="point_to_point")
        fs2, chis, _ = pipeline.run_gicp_fused(fs0, cfg)
        assert float(metrics.alignment_rmse(fs2)) < \
            float(metrics.alignment_rmse(fs0))
        assert float(chis[-1]) <= float(chis[0])
