"""Frame-sharded ring halo-exchange path: must match the dense
(replicated) solver on the ring adjacency, for multiple shardings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import Mesh

from mv_lm_icp_tpu.models import pipeline
from mv_lm_icp_tpu.parallel import ring
from mv_lm_icp_tpu.solvers import multiview as mv
from mv_lm_icp_tpu.models import correspond
from tests.test_multiview import synthetic_frameset


def ring_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), (ring.AXIS,))


def cfg_for(**kw):
    base = dict(rounds=1, knn=2, cutoff=1.0, metric="point_to_plane",
                robust=True, nn_chunk=64)
    base.update(kw)
    return pipeline.ICPConfig(**base)


class TestRingEdges:
    def test_ring_adjacency(self):
        e = np.asarray(ring.ring_edges(4))
        assert e.shape == (8, 2)
        s = set(map(tuple, e))
        assert (0, 1) in s and (0, 3) in s and (3, 0) in s and (3, 2) in s


@pytest.mark.parametrize("n_dev", [2, 4, 8])
class TestRingMatchesDense:
    def test_round_parity(self, n_dev):
        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=21)
        cfg = cfg_for()
        edges = ring.ring_edges(fs.num_frames)
        corr = correspond.find_correspondences(fs, edges, cfg.cutoff,
                                               chunk=cfg.nn_chunk)
        fs_dense, _ = mv.solve_multiview(
            fs, edges, corr, param_name=cfg.param_name, metric=cfg.metric,
            robust=cfg.robust, config=cfg.lm)
        fs_ring, _ = ring.ring_icp_round(fs, cfg, ring_mesh(n_dev))
        np.testing.assert_allclose(np.asarray(fs_ring.poses),
                                   np.asarray(fs_dense.poses), atol=1e-8)


class TestRingSchur:
    def test_schur_parity(self):
        """Schur elimination on the frame-sharded ring path matches the
        dense replicated solve."""
        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=21)
        cfg = cfg_for()
        edges = ring.ring_edges(fs.num_frames)
        corr = correspond.find_correspondences(fs, edges, cfg.cutoff,
                                               chunk=cfg.nn_chunk)
        fs_dense, _ = mv.solve_multiview(
            fs, edges, corr, param_name=cfg.param_name, metric=cfg.metric,
            robust=cfg.robust, config=cfg.lm)
        cfg_s = pipeline.enable_schur(cfg, fs, np.asarray(edges))
        assert any(cfg_s.schur_elim)
        fs_ring, _ = ring.ring_icp_round(fs, cfg_s, ring_mesh(4))
        np.testing.assert_allclose(np.asarray(fs_ring.poses),
                                   np.asarray(fs_dense.poses), atol=1e-6)


class TestRingCommModes:
    def test_blocks_equals_dense(self):
        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=23)
        mesh = ring_mesh(4)
        fs_b, _ = ring.ring_icp_round(fs, cfg_for(comm="blocks"), mesh)
        fs_d, _ = ring.ring_icp_round(fs, cfg_for(comm="dense"), mesh)
        np.testing.assert_allclose(np.asarray(fs_b.poses),
                                   np.asarray(fs_d.poses), atol=1e-7)


class TestBandedRing:
    """Round-4 generalization: any banded frame graph (the reference's
    FLAGS_knn > 2 graphs, main_multiview.cpp:36) runs frame-sharded with
    an H-hop halo + per-(frame, offset) edge mask — parity with the
    replicated solver on the concrete knn=3 graph."""

    def test_band_structure(self):
        F = 8
        e = np.asarray(ring.ring_edges(F))
        H, mask = ring.band_structure(e, F)
        assert H == 1 and mask.shape == (F, 2) and mask.all()
        # knn=3-style: add +-2 edges for frame 0 only
        e2 = np.concatenate([e, [[0, 2], [0, 6]]], axis=0)
        H2, m2 = ring.band_structure(e2, F)
        assert H2 == 2 and m2.shape == (F, 4)
        assert m2[0].all() and m2[1, 1] == False  # noqa: E712
        with pytest.raises(ValueError):
            ring.band_structure(np.asarray([[1, 1]]), F)

    @pytest.mark.parametrize("n_dev", [2, 4])
    def test_knn3_parity(self, n_dev):
        from mv_lm_icp_tpu.models import frameset as fsm

        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=21)
        cfg = cfg_for()
        edges = fsm.knn_pose_graph(fs.poses, 3)
        H, _ = ring.band_structure(edges, fs.num_frames)
        assert H >= 2   # knn=3 must exceed the +-1 ring
        corr = correspond.find_correspondences(fs, edges, cfg.cutoff,
                                               chunk=cfg.nn_chunk)
        fs_dense, _ = mv.solve_multiview(
            fs, edges, corr, param_name=cfg.param_name, metric=cfg.metric,
            robust=cfg.robust, config=cfg.lm)
        fs_ring, _ = ring.ring_icp_round(fs, cfg, ring_mesh(n_dev),
                                         edges=edges)
        np.testing.assert_allclose(np.asarray(fs_ring.poses),
                                   np.asarray(fs_dense.poses), atol=1e-8)

    def test_deep_halo_multi_hop(self):
        """H > floc forces multi-device ppermute hops (8 frames over 8
        devices, knn=5-style band H=2 > floc=1)."""
        from mv_lm_icp_tpu.models import frameset as fsm

        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=24)
        cfg = cfg_for()
        edges = fsm.knn_pose_graph(fs.poses, 4)
        H, _ = ring.band_structure(edges, fs.num_frames)
        assert H >= 2
        corr = correspond.find_correspondences(fs, edges, cfg.cutoff,
                                               chunk=cfg.nn_chunk)
        fs_dense, _ = mv.solve_multiview(
            fs, edges, corr, param_name=cfg.param_name, metric=cfg.metric,
            robust=cfg.robust, config=cfg.lm)
        fs_ring, _ = ring.ring_icp_round(fs, cfg, ring_mesh(8),
                                         edges=edges)
        np.testing.assert_allclose(np.asarray(fs_ring.poses),
                                   np.asarray(fs_dense.poses), atol=1e-8)


class TestRingConvergence:
    def test_multi_round(self):
        from mv_lm_icp_tpu.utils import metrics

        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=22)
        rmse0 = metrics.alignment_rmse(fs)
        mesh = ring_mesh(4)
        cfg = cfg_for()
        for _ in range(6):
            fs, _ = ring.ring_icp_round(fs, cfg, mesh)
        rmse1 = metrics.alignment_rmse(fs)
        assert rmse1 < rmse0 * 1e-2, (rmse0, rmse1)


class TestRingWindow:
    """Sorted-window NN on the frame-sharded ring path."""

    def test_window_matches_brute_ring(self):
        from tests.test_multiview import synthetic_frameset

        fs = synthetic_frameset(F=8, N=256, sigma=0.02, sigmat=0.01, seed=2)
        mesh = ring_mesh(4)
        cfg_b = pipeline.ICPConfig(rounds=1, cutoff=1.0, robust=True,
                                   nn_chunk=256)
        cfg_w = pipeline.ICPConfig(rounds=1, cutoff=1.0, robust=True,
                                   nn_chunk=256, use_window=True,
                                   window=256)
        fs_b, _ = ring.ring_icp_round(fs, cfg_b, mesh)
        fs_w, unc = ring.ring_icp_round(fs, cfg_w, mesh)
        assert int(unc) == 0
        np.testing.assert_allclose(np.asarray(fs_w.poses),
                                   np.asarray(fs_b.poses), atol=1e-8)

    def test_window_too_small_is_loud(self):
        from tests.test_multiview import synthetic_frameset

        fs = synthetic_frameset(F=8, N=256, sigma=0.02, sigmat=0.01, seed=2)
        cfg = pipeline.ICPConfig(rounds=1, cutoff=1.0, robust=True,
                                 nn_chunk=256, use_window=True, window=16)
        _, unc = ring.ring_icp_round(fs, cfg, ring_mesh(4))
        assert int(unc) > 0


class TestRingPallas:
    """Both Pallas kernels dispatched inside the ring shard_map (the
    HBM-limited regime they exist for, VERDICT r2 #4) must match the
    XLA backends bit-close."""

    def test_brute_pallas_parity(self):
        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=21)
        mesh = ring_mesh(4)
        fs_xla, _ = ring.ring_icp_round(fs, cfg_for(), mesh)
        fs_pls, _ = ring.ring_icp_round(fs, cfg_for(use_pallas=True), mesh)
        np.testing.assert_allclose(np.asarray(fs_pls.poses),
                                   np.asarray(fs_xla.poses), atol=1e-6)

    def test_window_pallas_parity(self):
        fs = synthetic_frameset(F=8, N=128, sigma=0.03, sigmat=0.02,
                                seed=21)
        mesh = ring_mesh(4)
        fs_xla, unc_x = ring.ring_icp_round(
            fs, cfg_for(use_window=True, window=128), mesh)
        fs_pls, unc_p = ring.ring_icp_round(
            fs, cfg_for(use_window=True, window=128, use_pallas=True),
            mesh)
        assert int(unc_x) == 0 and int(unc_p) == 0
        np.testing.assert_allclose(np.asarray(fs_pls.poses),
                                   np.asarray(fs_xla.poses), atol=1e-6)
