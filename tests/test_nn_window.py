"""Sorted-window NN backend: exactness-within-cutoff vs the brute-force
reference, coverage fallback semantics, and pipeline integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.ops import nn, nn_window


def _rand_cloud(key, n, scale=1.0):
    return scale * jax.random.normal(key, (n, 3), jnp.float64)


class TestWindowExactness:
    def test_matches_bruteforce_within_cutoff(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        ref = _rand_cloud(k1, 700)
        query = ref + 0.02 * jax.random.normal(k2, ref.shape, ref.dtype)
        valid = jnp.ones(700, bool)
        cutoff = 0.3
        bi, bd = nn.nn_1(query, ref, valid, chunk=256)
        wi, wd, unc = nn_window.nn_1_window(query, ref, valid, cutoff,
                                            window=700, query_chunk=128)
        assert int(unc) == 0
        keep = np.asarray(bd) < cutoff**2
        assert keep.mean() > 0.95
        np.testing.assert_array_equal(np.asarray(wi)[keep],
                                      np.asarray(bi)[keep])
        np.testing.assert_allclose(np.asarray(wd)[keep],
                                   np.asarray(bd)[keep], rtol=1e-9)
        # beyond-cutoff queries report unmatched, never a wrong index
        assert np.all(np.asarray(wi)[~keep] == -1)
        assert np.all(np.isinf(np.asarray(wd)[~keep]))

    def test_small_window_degrades_to_unmatched_not_wrong(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        ref = _rand_cloud(k1, 600)
        query = ref + 0.01 * jax.random.normal(k2, ref.shape, ref.dtype)
        valid = jnp.ones(600, bool)
        cutoff = 0.2
        bi, bd = nn.nn_1(query, ref, valid, chunk=256)
        wi, wd, unc = nn_window.nn_1_window(query, ref, valid, cutoff,
                                            window=64, query_chunk=64)
        assert int(unc) > 0   # undersized W is reported, not silent
        wi, wd, bi, bd = map(np.asarray, (wi, wd, bi, bd))
        matched = wi >= 0
        # every returned match is the true brute-force NN
        np.testing.assert_array_equal(wi[matched], bi[matched])
        np.testing.assert_allclose(wd[matched], bd[matched], rtol=1e-9)

    def test_invalid_refs_never_matched(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        ref = _rand_cloud(k1, 300)
        valid = jnp.arange(300) % 3 != 0
        query = _rand_cloud(k2, 200)
        wi, wd, _ = nn_window.nn_1_window(query, ref, valid, 1.0,
                                          window=300, query_chunk=64)
        wi = np.asarray(wi)
        assert np.all(wi[wi >= 0] % 3 != 0)

    def test_window_shortfall_bound(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        ref = _rand_cloud(k1, 512)
        query = _rand_cloud(k2, 512)
        valid = jnp.ones(512, bool)
        need = int(nn_window.window_shortfall(query, ref, valid, 0.1,
                                              query_chunk=128))
        wi, wd, unc = nn_window.nn_1_window(query, ref, valid, 0.1,
                                            window=max(need, 1),
                                            query_chunk=128)
        assert int(unc) == 0
        bi, bd = nn.nn_1(query, ref, valid, chunk=256)
        keep = np.asarray(bd) < 0.01
        np.testing.assert_array_equal(np.asarray(wi)[keep],
                                      np.asarray(bi)[keep])


class TestWindowKernel:
    """Batched Pallas windowed kernel vs per-edge brute force
    (interpret mode on CPU; the same kernel runs compiled on TPU)."""

    def test_batch_kernel_matches_bruteforce(self):
        from mv_lm_icp_tpu.kernels import nn_window_pallas as wp

        key = jax.random.PRNGKey(0)
        E, M, N = 3, 640, 900
        ks = jax.random.split(key, 2)
        ref = jax.random.normal(ks[0], (E, N, 3), jnp.float32)
        query = ref[:, :M] + 0.02 * jax.random.normal(ks[1], (E, M, 3),
                                                      jnp.float32)
        valid = jnp.ones((E, N), bool).at[:, -50:].set(False)
        cutoff = 0.3
        wi, wd, unc = wp.nn_1_window_batch(query, ref, valid, cutoff,
                                           window=1024, tq=128, td=128)
        assert np.all(np.asarray(unc) == 0)
        wi, wd = np.asarray(wi), np.asarray(wd)
        for e in range(E):
            bi, bd = nn.nn_1(query[e], ref[e], valid[e], chunk=256)
            bi, bd = np.asarray(bi), np.asarray(bd)
            keep = bd < cutoff**2
            np.testing.assert_array_equal(wi[e][keep], bi[keep])
            # kernel d2 is the exact elementwise distance (tighter than
            # the brute path's |q|^2+|r|^2-2qr expansion) — compare vs
            # an exact recompute, not vs bd
            exact = np.sum(
                (np.asarray(query[e])[keep]
                 - np.asarray(ref[e])[bi[keep]])**2, axis=-1)
            np.testing.assert_allclose(wd[e][keep], exact, rtol=1e-6)
            assert np.all(wi[e][~keep] == -1)

    def test_invalid_refs_and_small_window(self):
        from mv_lm_icp_tpu.kernels import nn_window_pallas as wp

        key = jax.random.PRNGKey(9)
        ks = jax.random.split(key, 2)
        ref = jax.random.normal(ks[0], (2, 500, 3), jnp.float32)
        query = jax.random.normal(ks[1], (2, 256, 3), jnp.float32)
        valid = jnp.arange(500)[None, :] % 4 != 0
        valid = jnp.broadcast_to(valid, (2, 500))
        wi, wd, unc = wp.nn_1_window_batch(query, ref, valid, 0.5,
                                           window=128, tq=128, td=128)
        wi = np.asarray(wi)
        matched = wi >= 0
        assert np.all(wi[matched] % 4 != 0)
        # every returned match is a true brute-force NN (never wrong)
        for e in range(2):
            bi, _ = nn.nn_1(query[e], ref[e], valid[e], chunk=256)
            m = wi[e] >= 0
            np.testing.assert_array_equal(wi[e][m], np.asarray(bi)[m])


class TestPipelineIntegration:
    def test_icp_round_with_window_backend(self):
        from mv_lm_icp_tpu.models import frameset, pipeline
        from tests.test_multiview import synthetic_frameset

        fs = synthetic_frameset(F=3, N=256, sigma=0.02, sigmat=0.01, seed=4)
        cfg_ref = pipeline.ICPConfig(rounds=3, knn=2, cutoff=1.0,
                                     metric="point_to_point", robust=False,
                                     nn_chunk=256)
        cfg_win = pipeline.ICPConfig(rounds=3, knn=2, cutoff=1.0,
                                     metric="point_to_point", robust=False,
                                     nn_chunk=256, use_window=True,
                                     window=256)
        fs_ref, _ = pipeline.run_icp(fs, cfg_ref)
        fs_win, _ = pipeline.run_icp(fs, cfg_win)
        np.testing.assert_allclose(np.asarray(fs_ref.poses),
                                   np.asarray(fs_win.poses), atol=1e-9)


class TestRaggedQueries:
    """ADVICE r1 (medium): FrameSet pad points survive pose transforms as
    merely-large finite coords (~1e6) that used to pass the sentinel
    filters, inflating boundary-tile guard intervals — silently dropping
    every REAL correspondence in the mixed tile. With query_valid they are
    re-sentineled before sorting and can no longer poison coverage."""

    def _ragged(self, key, n_real, n_pad, scale=1.0):
        ref = _rand_cloud(key, n_real, scale)
        # pad rows like datasets.pad_clouds (1e6) after a pose transform
        pad = 1.7e6 * jnp.ones((n_pad, 3), ref.dtype)
        query = jnp.concatenate([ref + 0.01, pad], axis=0)
        qvalid = jnp.arange(n_real + n_pad) < n_real
        return query, qvalid, ref

    def test_pad_queries_do_not_break_coverage(self):
        key = jax.random.PRNGKey(11)
        query, qvalid, ref = self._ragged(key, 448, 64)
        valid = jnp.ones(448, bool)
        cutoff = 0.2
        # W = full cloud: coverage MUST hold for every real query
        wi, wd, unc = nn_window.nn_1_window(
            query, ref, valid, cutoff, window=448, query_chunk=128,
            query_valid=qvalid)
        assert int(unc) == 0
        bi, bd = nn.nn_1(query[:448], ref, valid, chunk=256)
        keep = np.asarray(bd) < cutoff**2
        assert keep.mean() > 0.9
        np.testing.assert_array_equal(np.asarray(wi)[:448][keep],
                                      np.asarray(bi)[keep])
        # pad queries report unmatched
        assert np.all(np.asarray(wi)[448:] == -1)

    def test_without_mask_pad_queries_poison_boundary_tile(self):
        # The bug this guards against (ADVICE r1): a query cloud that
        # covers only a SUB-range of the ref axis (partial overlap — the
        # normal multiview case) plus pad rows sorting past the cloud end.
        # The mixed boundary tile's unmasked guard interval then spans
        # from the real sub-range all the way to the last ref row; with
        # the mask the interval stays tile-sized.
        key = jax.random.PRNGKey(11)
        ref = jnp.stack([jnp.linspace(0.0, 10.0, 448),
                         jnp.zeros(448), jnp.zeros(448)], axis=1)
        real = ref[ref[:, 0] < 2.5] + 0.01          # 112 queries, low end
        n_real = real.shape[0]
        pad = 1.7e6 * jnp.ones((64, 3), ref.dtype)
        query = jnp.concatenate([real, pad], axis=0)
        qvalid = jnp.arange(query.shape[0]) < n_real
        valid = jnp.ones(448, bool)
        cutoff = 0.2
        C = 64
        need = int(nn_window.window_shortfall(
            query, ref, valid, cutoff, query_chunk=C, query_valid=qvalid))
        # masked: W = the masked requirement covers every real query
        wi, _, unc = nn_window.nn_1_window(
            query, ref, valid, cutoff, window=need, query_chunk=C,
            query_valid=qvalid)
        assert int(unc) == 0
        assert np.all(np.asarray(wi)[:n_real] >= 0)
        # unmasked: same W loses the mixed tile — loud (unc>0) but those
        # real queries are dropped, exactly the silent-loss failure mode
        wi_bad, _, unc_bad = nn_window.nn_1_window(
            query, ref, valid, cutoff, window=need, query_chunk=C)
        assert int(unc_bad) > 0
        assert (np.asarray(wi_bad)[:n_real] == -1).sum() > 0

    def test_shortfall_not_inflated_by_pad_queries(self):
        # partial-overlap scenario: unmasked shortfall is inflated toward
        # N (the CLI auto-raise would negate the windowed speedup)
        ref = jnp.stack([jnp.linspace(0.0, 10.0, 448),
                         jnp.zeros(448), jnp.zeros(448)], axis=1)
        real = ref[ref[:, 0] < 2.5] + 0.01
        pad = 1.7e6 * jnp.ones((64, 3), ref.dtype)
        query = jnp.concatenate([real, pad], axis=0)
        qvalid = jnp.arange(query.shape[0]) < real.shape[0]
        valid = jnp.ones(448, bool)
        need_masked = int(nn_window.window_shortfall(
            query, ref, valid, 0.2, query_chunk=64, query_valid=qvalid))
        need_bad = int(nn_window.window_shortfall(
            query, ref, valid, 0.2, query_chunk=64))
        assert need_masked < 200         # tile-sized
        assert need_bad > need_masked    # unmasked reads pad as real
        assert need_bad > 300            # ...and spans to the cloud end

    def test_pallas_batch_ragged(self):
        from mv_lm_icp_tpu.kernels import nn_window_pallas as wp

        key = jax.random.PRNGKey(17)
        ks = jax.random.split(key, 2)
        E, n_real, n_pad = 2, 384, 128
        ref = jax.random.normal(ks[0], (E, 512, 3), jnp.float32)
        rvalid = jnp.arange(512)[None] < 448
        rvalid = jnp.broadcast_to(rvalid, (E, 512))
        pad = 1.7e6 * jnp.ones((E, n_pad, 3), jnp.float32)
        query = jnp.concatenate([ref[:, :n_real] + 0.01, pad], axis=1)
        qvalid = jnp.arange(n_real + n_pad)[None] < n_real
        qvalid = jnp.broadcast_to(qvalid, (E, n_real + n_pad))
        cutoff = 0.25
        wi, wd, unc = wp.nn_1_window_batch(
            query, ref, rvalid, cutoff, window=512, tq=128, td=128,
            query_valid=qvalid)
        assert np.all(np.asarray(unc) == 0)
        wi = np.asarray(wi)
        for e in range(E):
            bi, bd = nn.nn_1(query[e, :n_real], ref[e], rvalid[e],
                             chunk=256)
            keep = np.asarray(bd) < cutoff**2
            assert keep.mean() > 0.9
            np.testing.assert_array_equal(wi[e, :n_real][keep],
                                          np.asarray(bi)[keep])
            assert np.all(wi[e, n_real:] == -1)
