"""Grid-hash NN: exact-within-cutoff vs brute force, occupancy, edge
cases."""
import jax.numpy as jnp
import numpy as np

from mv_lm_icp_tpu.ops import nn_grid


def brute(q, r, valid):
    d2 = np.sum((q[:, None] - r[None]) ** 2, axis=-1)
    d2[:, ~valid] = np.inf
    return d2.argmin(1), d2.min(1)


class TestGridNN:
    def test_exact_within_cutoff(self):
        rng = np.random.default_rng(0)
        r = rng.normal(size=(3000, 3)) * 0.2
        q = r + rng.normal(size=(3000, 3)) * 0.01
        valid = rng.random(3000) > 0.05
        cutoff = 0.05
        occ = int(nn_grid.max_occupancy(jnp.asarray(r), jnp.asarray(valid),
                                        cutoff))
        assert occ <= 128, occ
        idx, d2 = nn_grid.nn_1_grid(jnp.asarray(q), jnp.asarray(r),
                                    jnp.asarray(valid), cutoff,
                                    query_chunk=512)
        bidx, bd2 = brute(q, r, valid)
        within = bd2 < cutoff ** 2
        idx, d2 = np.asarray(idx), np.asarray(d2)
        np.testing.assert_array_equal(idx[within], bidx[within])
        np.testing.assert_allclose(d2[within], bd2[within], rtol=1e-5)
        # beyond cutoff -> unmatched
        assert np.isinf(d2[~within]).all()
        assert (idx[~within] == -1).all()

    def test_negative_coordinates(self):
        rng = np.random.default_rng(1)
        r = rng.normal(size=(500, 3)) - 5.0
        q = r + rng.normal(size=(500, 3)) * 0.01
        valid = np.ones(500, bool)
        idx, d2 = nn_grid.nn_1_grid(jnp.asarray(q), jnp.asarray(r),
                                    jnp.asarray(valid), 0.1,
                                    query_chunk=256)
        bidx, bd2 = brute(q, r, valid)
        within = bd2 < 0.01
        np.testing.assert_array_equal(np.asarray(idx)[within], bidx[within])

    def test_matches_pipeline_cutoff_semantics(self):
        """Same kept-set as the correspondence pipeline's brute force."""
        rng = np.random.default_rng(2)
        r = rng.normal(size=(1000, 3)) * 0.3
        q = r + rng.normal(size=(1000, 3)) * 0.02
        valid = np.ones(1000, bool)
        cutoff = 0.05
        idx, d2 = nn_grid.nn_1_grid(jnp.asarray(q), jnp.asarray(r),
                                    jnp.asarray(valid), cutoff,
                                    query_chunk=512)
        bidx, bd2 = brute(q, r, valid)
        keep = bd2 < cutoff ** 2
        got_keep = np.asarray(d2) < cutoff ** 2
        np.testing.assert_array_equal(got_keep, keep)

    def test_invalid_refs_excluded(self):
        r = np.zeros((64, 3))
        r[32:] += 0.001  # near-duplicates, but invalid
        valid = np.arange(64) < 32
        q = np.full((4, 3), 0.001)
        idx, _ = nn_grid.nn_1_grid(jnp.asarray(q), jnp.asarray(r),
                                   jnp.asarray(valid), 0.1,
                                   query_chunk=4)
        assert (np.asarray(idx) < 32).all()


class TestGridInPipeline:
    def test_pipeline_with_grid_backend(self):
        """Grid-backend correspondences drive the same convergence as the
        brute-force backend (identical kept-set within cutoff)."""
        import jax.numpy as jnp

        from mv_lm_icp_tpu.models import frameset, pipeline
        from mv_lm_icp_tpu.utils import metrics
        from tests.test_multiview import synthetic_frameset

        fs = synthetic_frameset(F=4, N=256, sigma=0.02, sigmat=0.01,
                                seed=41)
        cfg_b = pipeline.ICPConfig(rounds=3, knn=2, cutoff=0.5,
                                   metric="point_to_point", robust=False,
                                   nn_chunk=128)
        cfg_g = pipeline.ICPConfig(rounds=3, knn=2, cutoff=0.5,
                                   metric="point_to_point", robust=False,
                                   nn_chunk=128, use_grid=True)
        fs_b, _ = pipeline.run_icp(fs, cfg_b)
        fs_g, _ = pipeline.run_icp(fs, cfg_g)
        np.testing.assert_allclose(np.asarray(fs_g.poses),
                                   np.asarray(fs_b.poses), atol=1e-6)
