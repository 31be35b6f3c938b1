"""Exactness tests for the NN search (vs naive O(N^2)) and PCA normals."""
import jax
import jax.numpy as jnp
import numpy as np

from mv_lm_icp_tpu.ops import nn, pca


def naive_nn(query, ref, ref_valid):
    d2 = np.sum((query[:, None, :] - ref[None, :, :]) ** 2, axis=-1)
    d2[:, ~ref_valid] = np.inf
    return d2.argmin(axis=1), d2.min(axis=1)


class TestNN:
    def test_nn1_exact_vs_naive(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(333, 3))
        r = rng.normal(size=(777, 3))
        valid = rng.random(777) > 0.1
        idx, d2 = nn.nn_1(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                          chunk=128)
        nidx, nd2 = naive_nn(q, r, valid)
        np.testing.assert_allclose(np.asarray(d2), nd2, atol=1e-9)
        # argmin may differ only on exact ties; distances decide
        np.testing.assert_array_equal(np.asarray(idx), nidx)

    def test_nn1_all_invalid_chunk(self):
        """A fully-invalid chunk must never win."""
        q = jnp.zeros((4, 3))
        r = jnp.concatenate([jnp.full((128, 3), 5.0), jnp.zeros((128, 3))])
        valid = jnp.concatenate([jnp.zeros(128, bool), jnp.ones(128, bool)])
        idx, d2 = nn.nn_1(q, r, valid, chunk=128)
        assert (np.asarray(idx) >= 128).all()
        np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-12)

    def test_nn1_nonmultiple_chunk(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=(50, 3))
        r = rng.normal(size=(100, 3))
        valid = np.ones(100, bool)
        idx, _ = nn.nn_1(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                         chunk=64)  # pad path
        nidx, _ = naive_nn(q, r, valid)
        np.testing.assert_array_equal(np.asarray(idx), nidx)

    def test_knn_exact(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=(60, 3))
        r = rng.normal(size=(500, 3))
        valid = rng.random(500) > 0.2
        k = 10
        idx, d2 = nn.knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                         k=k, chunk=128)
        full = np.sum((q[:, None, :] - r[None, :, :]) ** 2, axis=-1)
        full[:, ~valid] = np.inf
        expected_d = np.sort(full, axis=1)[:, :k]
        np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1),
                                   expected_d, atol=1e-9)
        # indices retrieve the same distances
        got = np.take_along_axis(full, np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.sort(got, axis=1), expected_d,
                                   atol=1e-9)

    def test_knn_self_query(self):
        """Query == ref: self must be the first neighbour (dist 0), as the
        reference relies on for PCA neighbourhoods (frame.cpp:208-242)."""
        rng = np.random.default_rng(3)
        r = rng.normal(size=(200, 3))
        valid = np.ones(200, bool)
        idx, d2 = nn.knn(jnp.asarray(r), jnp.asarray(r), jnp.asarray(valid),
                         k=5, chunk=64)
        np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(200))
        np.testing.assert_allclose(np.asarray(d2)[:, 0], 0.0, atol=1e-12)


class TestMaskedMedian:
    def test_matches_reference_convention(self):
        """Reference takes sorted[m//2] (frame.cpp:166-176), the upper
        median for even m."""
        x = jnp.asarray([5.0, 1.0, 3.0, 2.0])
        valid = jnp.ones(4, bool)
        # sorted = [1,2,3,5], m//2 = 2 -> 3.0
        assert float(nn.masked_median(x, valid)) == 3.0

    def test_masked(self):
        x = jnp.asarray([9.0, 1.0, 9.0, 3.0, 2.0, 9.0])
        valid = jnp.asarray([False, True, False, True, True, False])
        # valid sorted = [1,2,3], m//2=1 -> 2.0
        assert float(nn.masked_median(x, valid)) == 2.0

    def test_empty_fallback(self):
        x = jnp.asarray([1.0, 2.0])
        assert float(nn.masked_median(x, jnp.zeros(2, bool))) == 1.0

    def test_batched(self):
        x = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        v = jnp.ones((2, 3), bool)
        np.testing.assert_allclose(np.asarray(nn.masked_median(x, v)),
                                   [2.0, 5.0])


class TestPCA:
    def test_plane_normal(self):
        """Points on plane z = 0.1x + 0.2y -> normal ~ (-0.1,-0.2,1)/|.|,
        flipped toward camera (z<0) like common.h:343."""
        rng = np.random.default_rng(4)
        xy = rng.normal(size=(64, 2))
        z = 0.1 * xy[:, 0] + 0.2 * xy[:, 1]
        pts = jnp.asarray(np.column_stack([xy, z]))
        normal, curv = pca.pca_normal(pts[None])
        n = np.asarray(normal[0])
        expected = np.array([-0.1, -0.2, 1.0])
        expected /= np.linalg.norm(expected)
        if n[2] > 0:
            n = -n
        # camera flip means stored normal has z < 0
        assert float(normal[0][2]) <= 0
        np.testing.assert_allclose(np.abs(n @ expected), 1.0, atol=1e-10)
        assert float(curv[0]) < 1e-10

    def test_recompute_normals_sphere(self):
        """On a sphere, PCA normals must align with radial directions."""
        rng = np.random.default_rng(5)
        v = rng.normal(size=(512, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = jnp.asarray(v)
        valid = jnp.ones(512, bool)
        normals, _ = pca.recompute_normals(pts, valid, k=10, chunk=128)
        cos = np.abs(np.sum(np.asarray(normals) * v, axis=1))
        assert np.median(cos) > 0.99

    def test_invalid_points_placeholder(self):
        pts = jnp.asarray(np.random.default_rng(6).normal(size=(64, 3)))
        valid = jnp.arange(64) < 32
        normals, _ = pca.recompute_normals(pts, valid, k=5, chunk=64)
        np.testing.assert_allclose(np.asarray(normals[32:]),
                                   np.tile([0, 0, -1.0], (32, 1)))


class TestKnnWindow:
    """Sorted-window k-NN (the scalable getNeighbours replacement,
    frame.cpp:208-242) vs the exact brute-force knn."""

    def test_full_window_equals_brute(self):
        from mv_lm_icp_tpu.ops import nn_window

        rng = np.random.default_rng(7)
        pts = jnp.asarray(rng.normal(size=(600, 3)))
        valid = jnp.ones(600, bool)
        bi, bd = nn.knn(pts, pts, valid, k=10, chunk=256)
        wi, wd, ex = nn_window.knn_window(pts, pts, valid, k=10,
                                          window=600, query_chunk=128)
        assert np.asarray(ex).all()
        np.testing.assert_allclose(np.asarray(wd), np.asarray(bd),
                                   rtol=1e-12)
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(bi))

    def test_certified_rows_match_brute(self):
        from mv_lm_icp_tpu.ops import nn_window

        rng = np.random.default_rng(8)
        pts = jnp.asarray(rng.normal(size=(800, 3)))
        valid = jnp.ones(800, bool)
        bi, bd = nn.knn(pts, pts, valid, k=10, chunk=256)
        wi, wd, ex = nn_window.knn_window(pts, pts, valid, k=10,
                                          window=448, query_chunk=64)
        ex = np.asarray(ex)
        # a volumetric gaussian cloud is the worst case for the sorted-
        # window sweep (real scan SURFACES certify far better per row);
        # W=448 certifies >90% of N=800 here
        assert ex.mean() > 0.9
        np.testing.assert_array_equal(np.asarray(wi)[ex],
                                      np.asarray(bi)[ex])
        np.testing.assert_allclose(np.asarray(wd)[ex],
                                   np.asarray(bd)[ex], rtol=1e-12)

    def test_ragged_self_query(self):
        from mv_lm_icp_tpu.ops import nn_window

        rng = np.random.default_rng(9)
        n_real = 300
        pts = np.full((384, 3), 1e6)
        pts[:n_real] = rng.normal(size=(n_real, 3))
        pts = jnp.asarray(pts)
        valid = jnp.arange(384) < n_real
        bi, bd = nn.knn(pts[:n_real], pts, valid, k=8, chunk=128)
        wi, wd, ex = nn_window.knn_window(pts, pts, valid, k=8,
                                          window=384, query_chunk=64,
                                          query_valid=valid)
        ex = np.asarray(ex)
        assert ex.all()
        np.testing.assert_array_equal(np.asarray(wi)[:n_real],
                                      np.asarray(bi))

    def test_normals_window_equals_brute(self):
        rng = np.random.default_rng(10)
        v = rng.normal(size=(512, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = jnp.asarray(v)
        valid = jnp.ones(512, bool)
        nb, cb = pca.recompute_normals(pts, valid, k=10, chunk=128)
        nw, cw = pca.recompute_normals(pts, valid, k=10, window=512)
        np.testing.assert_allclose(np.asarray(nw), np.asarray(nb),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(cw), np.asarray(cb),
                                   atol=1e-12)


class TestEigh3:
    """Analytic SoA 3x3 symmetric eigensolver vs jnp.linalg.eigh."""

    def test_matches_lapack_eigh(self):
        rng = np.random.default_rng(11)
        B = rng.normal(size=(500, 3, 3))
        A = B @ np.swapaxes(B, 1, 2)        # SPD-ish symmetric
        a = jnp.asarray(A)
        vx, vy, vz, lam, tr = pca.eigh3_smallest(
            a[:, 0, 0], a[:, 0, 1], a[:, 0, 2],
            a[:, 1, 1], a[:, 1, 2], a[:, 2, 2])
        evals, evecs = np.linalg.eigh(A)
        np.testing.assert_allclose(np.asarray(lam), evals[:, 0],
                                   rtol=1e-8, atol=1e-10)
        v = np.stack([vx, vy, vz], axis=1)
        cos = np.abs(np.sum(v * evecs[:, :, 0], axis=1))
        np.testing.assert_allclose(cos, 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(tr),
                                   np.trace(A, axis1=1, axis2=2),
                                   rtol=1e-12)

    def test_degenerate_isotropic(self):
        a = jnp.asarray(np.tile(np.eye(3)[None], (4, 1, 1)))
        vx, vy, vz, lam, tr = pca.eigh3_smallest(
            a[:, 0, 0], a[:, 0, 1], a[:, 0, 2],
            a[:, 1, 1], a[:, 1, 2], a[:, 2, 2])
        v = np.stack([vx, vy, vz], axis=1)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0)
        np.testing.assert_allclose(np.asarray(lam), 1.0, atol=1e-6)


class TestKnnWindowPallas:
    """Round-4 kernel: sorted-window k-NN in Pallas (interpret mode on
    CPU) — the tuned neighbourhood search for PCA normals at large-scene
    sizes (reference getNeighbours(i, 10), frame.cpp:208-242)."""

    def test_matches_brute_knn(self):
        from mv_lm_icp_tpu.kernels import nn_window_pallas as kwp
        from mv_lm_icp_tpu.ops import nn as nn_ops

        key = jax.random.PRNGKey(0)
        N = 700
        pts = jax.random.normal(key, (N, 3), jnp.float32)
        valid = jnp.arange(N) < 650
        idx_b, d2_b = nn_ops.knn(pts, pts, valid, k=10, chunk=256)
        idx_p, d2_p, ex_p = kwp.knn_window_batch(
            pts[None], pts[None], valid[None], k=10, window=1024,
            tq=128, td=128, query_valid=valid[None])
        m = np.asarray(valid)
        ex = np.asarray(ex_p[0])
        assert ex[m].all()   # full-cloud window => every query certified
        np.testing.assert_allclose(np.asarray(d2_p[0])[m],
                                   np.asarray(d2_b)[m], atol=1e-5)

    def test_certificate_fails_closed(self):
        """A window far smaller than the cloud must refuse to certify
        some queries rather than silently return wrong neighbours."""
        from mv_lm_icp_tpu.kernels import nn_window_pallas as kwp

        key = jax.random.PRNGKey(3)
        N = 1024
        pts = jax.random.normal(key, (N, 3), jnp.float32)
        valid = jnp.ones(N, bool)
        _, _, ex = kwp.knn_window_batch(
            pts[None], pts[None], valid[None], k=10, window=128,
            tq=128, td=128, query_valid=valid[None])
        assert not np.asarray(ex[0]).all()

    def test_recompute_normals_pallas_parity(self):
        key = jax.random.PRNGKey(1)
        N = 900
        pts = jax.random.normal(key, (N, 3), jnp.float32)
        valid = jnp.arange(N) < 850
        nb, cb = pca.recompute_normals(pts, valid, k=10, chunk=256)
        npx, cpx = pca.recompute_normals(pts, valid, k=10, window=1024,
                                         use_pallas=True)
        m = np.asarray(valid)
        dot = np.abs(np.sum(np.asarray(npx)[m] * np.asarray(nb)[m],
                            axis=1))
        assert float(dot.min()) > 0.999
        np.testing.assert_allclose(np.asarray(cpx)[m],
                                   np.asarray(cb)[m], atol=1e-4)
