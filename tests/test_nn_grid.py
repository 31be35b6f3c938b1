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
