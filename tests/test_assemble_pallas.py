"""Fused Pallas assembly-kernel parity vs the einsum reference paths
(interpreter mode on the CPU test backend; the real-TPU drive is asserted
every bench run)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.kernels import assemble_pallas as ap
from mv_lm_icp_tpu.ops import residuals as res_mod
from mv_lm_icp_tpu.ops import robust as robust_mod
from mv_lm_icp_tpu.ops import se3
from mv_lm_icp_tpu.solvers import posegraph as pg


def _random_problem(seed=0, E=3, N=200):
    rng = np.random.default_rng(seed)
    p = rng.normal(size=(E, N, 3)).astype(np.float32) * 0.4
    q = (p + rng.normal(size=(E, N, 3)).astype(np.float32) * 0.02)
    n = rng.normal(size=(E, N, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    mask = (rng.random((E, N)) > 0.15).astype(np.float32)
    scale = (0.05 + rng.random(E) * 0.1).astype(np.float32)
    taus = rng.normal(size=(E, 2, 6)).astype(np.float32) * 0.2
    xh = jax.vmap(lambda t: se3.exp(jnp.asarray(t)))(jnp.asarray(taus[:, 0]))
    xk = jax.vmap(lambda t: se3.exp(jnp.asarray(t)))(jnp.asarray(taus[:, 1]))
    return (jnp.asarray(p), jnp.asarray(q), jnp.asarray(n),
            jnp.asarray(mask), jnp.asarray(scale), xh, xk)


def _fused(p, q, n, mask, scale, xh, xk, mode, loss, eprec=0.01):
    packed = ap.pack_edges(p, q, n, mask, tr=2)
    Rh, th = jax.vmap(se3.to_Rt)(xh)
    Rk, tk = jax.vmap(se3.to_Rt)(xk)
    scal = ap.pack_scalars(Rh, th, Rk, tk, scale, eprec)
    return ap.system_terms(packed, scal, mode=mode, loss=loss, tr=2,
                           interpret=True)


def _assert_terms_close(got, want, rtol=2e-4, atol=2e-5):
    names = ("cost", "g_h", "g_k", "H_hh", "H_hk", "H_kk")
    for name, a, b in zip(names, got, want):
        b = np.asarray(b)
        # near-zero entries of an O(scale) matrix carry f32 cancellation
        # noise from both paths — bound them relative to the matrix scale
        tol = max(atol, 1e-6 * float(np.max(np.abs(b), initial=0.0)))
        np.testing.assert_allclose(np.asarray(a), b, rtol=rtol, atol=tol,
                                   err_msg=name)


class TestLMAssembly:
    @pytest.mark.parametrize("loss", ["trivial", "soft_l1", "soft_l1_norm"])
    def test_p2pl_matches_einsum(self, loss):
        p, q, n, mask, scale, xh, xk = _random_problem(0)
        got = _fused(p, q, n, mask, scale, xh, xk, "lm_p2pl", loss)

        def ref_edge(e):
            r, Jh, Jk = res_mod.residuals_and_jacobians(
                res_mod.SE3, "point_to_plane", xh[e], xk[e],
                p[e], q[e], n[e])
            rho, w = robust_mod.LOSSES[loss](r * r, scale[e])
            return res_mod.p2pl_system_terms(r, Jh, Jk, w * mask[e], rho,
                                             mask[e])

        want = jax.vmap(ref_edge)(jnp.arange(p.shape[0]))
        _assert_terms_close(got, want)

    @pytest.mark.parametrize("loss", ["trivial", "soft_l1"])
    def test_p2pt_matches_einsum(self, loss):
        p, q, n, mask, scale, xh, xk = _random_problem(1)
        got = _fused(p, q, n, mask, scale, xh, xk, "lm_p2pt", loss)

        def ref_edge(e):
            r, Jh, Jk = res_mod.residuals_and_jacobians(
                res_mod.SE3, "point_to_point", xh[e], xk[e],
                p[e], q[e], None)
            s = jnp.sum(r * r, axis=-1)
            rho, w = robust_mod.LOSSES[loss](s, scale[e])
            w = w * mask[e]
            hi = jax.lax.Precision.HIGHEST
            cost = 0.5 * jnp.sum(rho * mask[e])
            g_h = jnp.einsum("nij,ni->j", Jh, w[:, None] * r, precision=hi)
            g_k = jnp.einsum("nij,ni->j", Jk, w[:, None] * r, precision=hi)
            H_hh = jnp.einsum("nij,n,nik->jk", Jh, w, Jh, precision=hi)
            H_hk = jnp.einsum("nij,n,nik->jk", Jh, w, Jk, precision=hi)
            H_kk = jnp.einsum("nij,n,nik->jk", Jk, w, Jk, precision=hi)
            return cost, g_h, g_k, H_hh, H_hk, H_kk

        want = jax.vmap(ref_edge)(jnp.arange(p.shape[0]))
        _assert_terms_close(got, want)


class TestGICPAssembly:
    @pytest.mark.parametrize("p2pl", [True, False])
    def test_matches_gicp_terms(self, p2pl):
        p, q, n, mask, scale, xh, xk = _random_problem(2)
        eprec = 0.01
        mode = "gicp_p2pl" if p2pl else "gicp_p2pt"
        got = _fused(p, q, n, mask, scale, xh, xk, mode, "trivial", eprec)

        def ref_edge(e):
            r, Jh, Jk = res_mod.residuals_and_jacobians(
                res_mod.SE3, "point_to_point", xh[e], xk[e],
                p[e], q[e], None)
            ng = se3.rotate_only(xk[e], n[e])
            return pg._gicp_terms(r, Jh, Jk, ng, eprec, mask[e], p2pl)

        want = jax.vmap(ref_edge)(jnp.arange(p.shape[0]))
        _assert_terms_close(got, want)


class TestEndToEnd:
    """The fused path through the full joint LM solve lands on the same
    poses as the einsum path (tiny problem; interpreter-mode kernel)."""

    def _frameset(self, F=3, N=64, seed=7):
        from mv_lm_icp_tpu.models import frameset

        rng = np.random.default_rng(seed)
        base = rng.normal(size=(N, 3)).astype(np.float32)
        nor = rng.normal(size=(N, 3)).astype(np.float32)
        nor /= np.linalg.norm(nor, axis=-1, keepdims=True)
        gt = [jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)]
        for _ in range(1, F):
            tau = jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32)
            gt.append(se3.compose(gt[-1], se3.exp(tau)))
        gt = jnp.stack(gt)
        noisy = jnp.stack([
            gt[0]] + [se3.boxplus(
                gt[i], jnp.asarray(rng.normal(size=6) * 0.02, jnp.float32))
                for i in range(1, F)])
        inv_gt = jax.vmap(se3.inverse)(gt)
        pts = jax.vmap(lambda g: se3.apply(g, jnp.asarray(base)))(inv_gt)
        nrm = jax.vmap(lambda g: se3.rotate_only(g, jnp.asarray(nor)))(
            inv_gt)
        return frameset.FrameSet(
            points=pts, normals=nrm, valid=jnp.ones((F, N), bool),
            poses=noisy, gt_poses=gt,
            fixed=jnp.asarray(np.arange(F) == 0))

    @pytest.mark.parametrize("metric",
                             ["point_to_plane", "point_to_point"])
    def test_solve_multiview_parity(self, metric):
        from mv_lm_icp_tpu.models import correspond, frameset
        from mv_lm_icp_tpu.solvers import lm as lm_mod
        from mv_lm_icp_tpu.solvers import multiview as mv

        fs = self._frameset()
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, 1.0, chunk=64)
        cfg = lm_mod.LMConfig(max_iterations=6)
        fs_e, _ = mv.solve_multiview(fs, edges, corr, metric=metric,
                                     config=cfg, assembly="einsum")
        fs_f, _ = mv.solve_multiview(fs, edges, corr, metric=metric,
                                     config=cfg, assembly="fused")
        np.testing.assert_allclose(np.asarray(fs_f.poses),
                                   np.asarray(fs_e.poses),
                                   rtol=1e-4, atol=2e-5)

    @pytest.mark.parametrize("metric",
                             ["point_to_plane", "point_to_point"])
    def test_solve_pairwise_parity(self, metric):
        """Pairwise solves through the fused kernel (dst pinned at
        identity) land on the einsum path's pose."""
        from mv_lm_icp_tpu.solvers import lm as lm_mod

        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32)
                          * 0.3)
        nor = rng.normal(size=(300, 3)).astype(np.float32)
        nor = jnp.asarray(nor / np.linalg.norm(nor, axis=-1,
                                               keepdims=True))
        gt = se3.exp(jnp.asarray(rng.normal(size=6) * 0.1, jnp.float32))
        dst = se3.apply(gt, pts)
        nd = se3.rotate_only(gt, nor)
        a, _ = lm_mod.solve_pairwise(pts, dst, nd, param_name="se3",
                                     metric=metric, loss="soft_l1",
                                     loss_scale=0.1, assembly="einsum")
        b, _ = lm_mod.solve_pairwise(pts, dst, nd, param_name="se3",
                                     metric=metric, loss="soft_l1",
                                     loss_scale=0.1, assembly="fused")
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=2e-6)

    def test_posegraph_parity(self):
        from mv_lm_icp_tpu.models import correspond, frameset

        fs = self._frameset(seed=11)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, 1.0, chunk=64)
        fs_e, _, _ = pg.solve_posegraph_fused(
            fs, edges, corr, outer_rounds=2, inner_iterations=5,
            assembly="einsum")
        fs_f, _, _ = pg.solve_posegraph_fused(
            fs, edges, corr, outer_rounds=2, inner_iterations=5,
            assembly="fused")
        np.testing.assert_allclose(np.asarray(fs_f.poses),
                                   np.asarray(fs_e.poses),
                                   rtol=1e-4, atol=2e-5)


class TestPacking:
    def test_padding_contributes_nothing(self):
        """A cloud padded by a full extra tile gives identical terms."""
        p, q, n, mask, scale, xh, xk = _random_problem(3, E=2, N=100)
        a = _fused(p, q, n, mask, scale, xh, xk, "lm_p2pl", "soft_l1")
        pad = ((0, 0), (0, 300), (0, 0))
        b = _fused(jnp.asarray(np.pad(np.asarray(p), pad)),
                   jnp.asarray(np.pad(np.asarray(q), pad)),
                   jnp.asarray(np.pad(np.asarray(n), pad)),
                   jnp.asarray(np.pad(np.asarray(mask), pad[:2])),
                   scale, xh, xk, "lm_p2pl", "soft_l1")
        _assert_terms_close(a, b, rtol=1e-6, atol=1e-7)
