"""Distributed path: sharded ICP over the 8-device virtual CPU mesh must
match the single-device pipeline, for every mesh factorization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.models import frameset, pipeline
from mv_lm_icp_tpu.parallel import mesh as mesh_mod
from mv_lm_icp_tpu.parallel import sharded
from tests.test_multiview import synthetic_frameset


def cfg_for_tests(**kw):
    base = dict(rounds=2, knn=2, cutoff=1.0, metric="point_to_plane",
                robust=True, nn_chunk=128)
    base.update(kw)
    return pipeline.ICPConfig(**base)


class TestMesh:
    def test_factorization(self):
        assert mesh_mod._factor(8) in [(4, 2), (8, 1)]
        assert mesh_mod._factor(1) == (1, 1)
        e, p = mesh_mod._factor(6)
        assert e * p == 6 and e >= p

    def test_make_mesh(self):
        m = mesh_mod.make_mesh()
        assert m.shape[mesh_mod.EDGE_AXIS] * m.shape[mesh_mod.POINT_AXIS] \
            == len(jax.devices())


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
class TestShardedEqualsSingle:
    def test_round_parity(self, shape):
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        cfg = cfg_for_tests(rounds=1)
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        fs_single, _, _ = pipeline.icp_round(fs, edges, cfg)
        m = mesh_mod.make_mesh(shape=shape)
        fs_shard, _ = sharded.sharded_icp_round(fs, edges, cfg, m)
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses),
                                   atol=1e-8)


class TestShardedPallas:
    def test_pallas_backend_parity(self):
        """The per-device Pallas NN kernel (interpret mode on CPU) matches
        the XLA backend inside shard_map."""
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        m = mesh_mod.make_mesh(shape=(4, 2))
        fs_xla, _ = sharded.sharded_icp_round(fs, edges,
                                              cfg_for_tests(rounds=1), m)
        fs_pls, _ = sharded.sharded_icp_round(
            fs, edges, cfg_for_tests(rounds=1, use_pallas=True), m)
        np.testing.assert_allclose(np.asarray(fs_pls.poses),
                                   np.asarray(fs_xla.poses), atol=1e-6)


class TestShardedConvergence:
    def test_multi_round(self):
        fs = synthetic_frameset(F=4, N=256, sigma=0.04, sigmat=0.02, seed=5)
        from mv_lm_icp_tpu.utils import metrics

        m = mesh_mod.make_mesh(shape=(4, 2))
        rmse0 = metrics.alignment_rmse(fs)
        fs2 = sharded.run_icp_sharded(fs, cfg_for_tests(rounds=6), m)
        rmse1 = metrics.alignment_rmse(fs2)
        assert rmse1 < rmse0 * 1e-2, (rmse0, rmse1)

    def test_edge_padding(self):
        """Edge count not divisible by mesh size: padded with sentinel
        rows that must not change the solution."""
        fs = synthetic_frameset(F=3, N=128, sigma=0.02, sigmat=0.01, seed=6)
        cfg = cfg_for_tests(rounds=1, nn_chunk=64)
        edges = frameset.knn_pose_graph(fs.poses, 2)  # E = 6
        assert edges.shape[0] % 8 != 0
        fs_single, _, _ = pipeline.icp_round(fs, edges, cfg)
        m = mesh_mod.make_mesh(shape=(8, 1))
        fs_shard, _ = sharded.sharded_icp_round(fs, edges, cfg, m)
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses), atol=1e-8)

    @pytest.mark.parametrize("loss", ["soft_l1", "soft_l1_norm"])
    def test_edge_padding_anchor_edges(self, loss):
        """Advisor r3 (high): padded edges must stay inert when
        fixed_src_edges=True disables the fixed-frame mask. Frame-0
        self-loop padding used to become live zero-distance matches whose
        zero robust scale made soft_l1_norm reweight by ~1/tiny,
        overflowing the f32 Hessian to inf -> NaN after the gauge mask —
        every LM step then got rejected and the sharded solve silently
        returned the input poses bit-unchanged."""
        fs = synthetic_frameset(F=3, N=128, sigma=0.02, sigmat=0.01, seed=6)
        cfg = cfg_for_tests(rounds=1, nn_chunk=64, loss=loss,
                            fixed_src_edges=True)
        edges = frameset.knn_pose_graph(fs.poses, 2)  # E = 6 -> pad to 8
        fs_single, _, _ = pipeline.icp_round(fs, edges, cfg)
        m = mesh_mod.make_mesh(shape=(8, 1))
        fs_shard, _ = sharded.sharded_icp_round(fs, edges, cfg, m)
        # the solve must actually move the poses (the bug's symptom was a
        # bit-unchanged return), and must match the single-device path
        assert not np.allclose(np.asarray(fs_shard.poses),
                               np.asarray(fs.poses), atol=1e-12)
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses), atol=1e-7)


@pytest.mark.parametrize("shape", [(8, 1), (2, 4)])
class TestShardedSchur:
    """Schur elimination distributed over the mesh: the reduced-system
    solve must match the single-device dense solve exactly (the
    elimination is algebraic, icp-ceres.cpp:66-89 equivalent)."""

    def test_schur_round_parity(self, shape):
        fs = synthetic_frameset(F=6, N=256, sigma=0.03, sigmat=0.02, seed=3)
        cfg = cfg_for_tests(rounds=1)
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        fs_single, _, _ = pipeline.icp_round(fs, edges, cfg)
        cfg_s = pipeline.enable_schur(cfg, fs, edges)
        assert any(cfg_s.schur_elim)
        m = mesh_mod.make_mesh(shape=shape)
        fs_shard, _ = sharded.sharded_icp_round(fs, edges, cfg_s, m)
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses), atol=1e-6)


class TestCommModes:
    """Block-sparse collective exchange (O(E) per-edge blocks) must match
    the dense O(F^2) psum bit-for-bit-ish, and must actually be smaller."""

    @pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
    def test_blocks_equals_dense(self, shape):
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        m = mesh_mod.make_mesh(shape=shape)
        fs_b, _ = sharded.sharded_icp_round(
            fs, edges, cfg_for_tests(rounds=1, comm="blocks"), m)
        fs_d, _ = sharded.sharded_icp_round(
            fs, edges, cfg_for_tests(rounds=1, comm="dense"), m)
        np.testing.assert_allclose(np.asarray(fs_b.poses),
                                   np.asarray(fs_d.poses), atol=1e-7)

    def test_prune_parity(self):
        """Median pruning under the mesh matches the single-device path."""
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        cfg = cfg_for_tests(rounds=1, prune=True)
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        fs_single, _, _ = pipeline.icp_round(fs, edges, cfg)
        m = mesh_mod.make_mesh(shape=(2, 4))
        fs_shard, _ = sharded.sharded_icp_round(fs, edges, cfg, m)
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses), atol=1e-8)

    def test_collective_floats(self):
        from mv_lm_icp_tpu.parallel import assemble

        F, E = 36, 72   # Bunny-scale knn=2 graph
        b = assemble.collective_floats(F, E, "blocks")
        d = assemble.collective_floats(F, E, "dense")
        assert b == 72 * 120 and d == 216 * 216 + 216
        assert b < d / 5
        with pytest.raises(ValueError):
            assemble.collective_floats(F, E, "nope")


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
class TestShardedWindow:
    """Sorted-window NN under shard_map (both XLA and Pallas variants)
    must match the single-device window pipeline — the large-sharded-scene
    configuration's correspondence path (frame.cpp:91-185 at scale)."""

    def test_window_xla_parity(self, shape):
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        cfg = cfg_for_tests(rounds=1, use_window=True, window=256)
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        fs_single, _, _ = pipeline.icp_round(fs, edges, cfg)
        m = mesh_mod.make_mesh(shape=shape)
        fs_shard, unc = sharded.sharded_icp_round(fs, edges, cfg, m)
        assert int(unc) == 0
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses), atol=1e-8)

    def test_window_pallas_parity(self, shape):
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        cfg = cfg_for_tests(rounds=1, use_window=True, window=256,
                            use_pallas=True)
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        # single-device reference: the plain XLA window backend
        cfg_ref = cfg_for_tests(rounds=1, use_window=True, window=256)
        fs_single, _, _ = pipeline.icp_round(fs, edges, cfg_ref)
        m = mesh_mod.make_mesh(shape=shape)
        fs_shard, unc = sharded.sharded_icp_round(fs, edges, cfg, m)
        assert int(unc) == 0
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses), atol=1e-6)

    def test_window_too_small_is_loud(self, shape):
        """Shrinking W until coverage breaks must raise the uncovered
        counter, never silently degrade (frame.cpp:156-160 contract)."""
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        cfg = cfg_for_tests(rounds=1, use_window=True, window=16)
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        m = mesh_mod.make_mesh(shape=shape)
        _, unc = sharded.sharded_icp_round(fs, edges, cfg, m)
        assert int(unc) > 0


class TestShardedPosegraph:
    """The GICP pose-graph solver (g2o equivalent, icp-g2o.cpp:149-315)
    under the mesh must match the single-device fused chi2 loop — same
    rounds run, same poses (SURVEY §7.2.9's sharded-scene obligation)."""

    @pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
    def test_gicp_round_parity(self, shape):
        from mv_lm_icp_tpu.models import correspond
        from mv_lm_icp_tpu.solvers import posegraph

        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        cfg = cfg_for_tests(rounds=1)
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        corr = correspond.find_correspondences(fs, edges, cfg.cutoff,
                                               chunk=cfg.nn_chunk)
        fs_single, hist_s, rounds_s = posegraph.solve_posegraph_fused(
            fs, edges, corr, point_to_plane=True)
        m = mesh_mod.make_mesh(shape=shape)
        fs_shard, hist_m, rounds_m, unc = sharded.sharded_posegraph_round(
            fs, edges, cfg, m, point_to_plane=True)
        assert int(unc) == 0
        assert int(rounds_m) == int(rounds_s)
        np.testing.assert_allclose(np.asarray(fs_shard.poses),
                                   np.asarray(fs_single.poses), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(hist_m[:int(rounds_m)]),
            np.asarray(hist_s[:int(rounds_s)]), rtol=1e-4)

    def test_gicp_blocks_equals_dense(self):
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=3)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        m = mesh_mod.make_mesh(shape=(2, 4))
        fs_b, _, _, _ = sharded.sharded_posegraph_round(
            fs, edges, cfg_for_tests(rounds=1, comm="blocks"), m)
        fs_d, _, _, _ = sharded.sharded_posegraph_round(
            fs, edges, cfg_for_tests(rounds=1, comm="dense"), m)
        np.testing.assert_allclose(np.asarray(fs_b.poses),
                                   np.asarray(fs_d.poses), atol=1e-7)
