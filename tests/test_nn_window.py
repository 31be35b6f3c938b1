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
        wi, wd = nn_window.nn_1_window(query, ref, valid, cutoff,
                                       window=700, query_chunk=128)
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
        wi, wd = nn_window.nn_1_window(query, ref, valid, cutoff,
                                       window=64, query_chunk=64)
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
        wi, wd = nn_window.nn_1_window(query, ref, valid, 1.0,
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
        wi, wd = nn_window.nn_1_window(query, ref, valid, 0.1,
                                       window=max(need, 1), query_chunk=128)
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
        wi, wd = wp.nn_1_window_batch(query, ref, valid, cutoff,
                                      window=1024, tq=128, td=128)
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
        wi, wd = wp.nn_1_window_batch(query, ref, valid, 0.5,
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
