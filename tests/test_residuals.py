"""Analytic Jacobians must agree with forward-mode autodiff through the
boxplus operators, for every parameterization x metric — the 7th 'hard
part' in SURVEY §7.3 (quaternion sign/storage bugs are silent otherwise)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.ops import residuals as R
from mv_lm_icp_tpu.ops import robust, se3


def fixtures(seed=0, n=17):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(k, 5)
    p = jax.random.normal(k1, (n, 3), jnp.float64)
    q = jax.random.normal(k2, (n, 3), jnp.float64)
    nor = jax.random.normal(k3, (n, 3), jnp.float64)
    nor = nor / jnp.linalg.norm(nor, axis=-1, keepdims=True)
    xh7 = se3.exp(jax.random.normal(k4, (6,), jnp.float64) * 0.5)
    xk7 = se3.exp(jax.random.normal(k5, (6,), jnp.float64) * 0.5)
    return p, q, nor, xh7, xk7


@pytest.mark.parametrize("param_name", ["se3", "quat", "angle_axis"])
@pytest.mark.parametrize("metric", ["point_to_point", "point_to_plane"])
class TestAnalyticVsAutodiff:
    def test_agreement(self, param_name, metric):
        p, q, nor, xh7, xk7 = fixtures()
        param = R.PARAMS[param_name]
        xh, xk = param.from_pose7(xh7), param.from_pose7(xk7)
        r_a, Jh_a, Jk_a = R.residuals_and_jacobians(
            param, metric, xh, xk, p, q, nor)
        r_d, Jh_d, Jk_d = R.residuals_and_jacobians_autodiff(
            param, metric, xh, xk, p, q, nor)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_d),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(Jh_a), np.asarray(Jh_d),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(Jk_a), np.asarray(Jk_d),
                                   atol=1e-10)

    def test_finite_difference(self, param_name, metric):
        """r(boxplus(x, eps e)) - r(x) ~= eps J e for both blocks."""
        p, q, nor, xh7, xk7 = fixtures(seed=1, n=5)
        param = R.PARAMS[param_name]
        xh, xk = param.from_pose7(xh7), param.from_pose7(xk7)
        r0, Jh, Jk = R.residuals_and_jacobians(param, metric, xh, xk, p, q, nor)
        eps = 1e-7
        for axis in range(6):
            e = jnp.zeros(6, jnp.float64).at[axis].set(eps)
            r_h = R.residuals(param, metric, param.boxplus(xh, e), xk, p, q, nor)
            r_k = R.residuals(param, metric, xh, param.boxplus(xk, e), p, q, nor)
            fd_h = np.asarray((r_h - r0) / eps)
            fd_k = np.asarray((r_k - r0) / eps)
            if metric == "point_to_point":
                np.testing.assert_allclose(fd_h, np.asarray(Jh[:, :, axis]),
                                           atol=1e-5)
                np.testing.assert_allclose(fd_k, np.asarray(Jk[:, :, axis]),
                                           atol=1e-5)
            else:
                np.testing.assert_allclose(fd_h, np.asarray(Jh[:, axis]),
                                           atol=1e-5)
                np.testing.assert_allclose(fd_k, np.asarray(Jk[:, axis]),
                                           atol=1e-5)


class TestResidualSemantics:
    def test_p2pl_is_projected_p2pt(self):
        """p2pl residual == p2pt residual dotted with the rotated (not
        translated) dst normal (icp-ceres.h:134)."""
        p, q, nor, xh7, xk7 = fixtures(seed=2)
        r3 = R.residuals(R.SE3, "point_to_point", xh7, xk7, p, q)
        ng = se3.rotate_only(xk7, nor)
        r1 = R.residuals(R.SE3, "point_to_plane", xh7, xk7, p, q, nor)
        np.testing.assert_allclose(np.asarray(r1),
                                   np.asarray(jnp.sum(r3 * ng, -1)),
                                   atol=1e-12)

    def test_zero_at_ground_truth(self):
        """Perfect correspondences + true poses -> zero residual."""
        key = jax.random.PRNGKey(3)
        p = jax.random.normal(key, (50, 3), jnp.float64)
        xh7 = se3.exp(jnp.array([0.1, -0.2, 0.3, 0.4, 0.5, -0.6]))
        xk7 = se3.exp(jnp.array([-0.3, 0.1, 0.2, -0.1, 0.2, 0.3]))
        # q such that g_h(p) == g_k(q):  q = g_k^-1(g_h(p))
        q = se3.apply(se3.compose(se3.inverse(xk7), xh7), p)
        r = R.residuals(R.SE3, "point_to_point", xh7, xk7, p, q)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)

    def test_params_agree_on_same_pose(self):
        """All three parameterizations evaluate the same energy."""
        p, q, nor, xh7, xk7 = fixtures(seed=4)
        vals = []
        for name, param in R.PARAMS.items():
            r = R.residuals(param, "point_to_plane",
                            param.from_pose7(xh7), param.from_pose7(xk7),
                            p, q, nor)
            vals.append(np.asarray(r))
        np.testing.assert_allclose(vals[0], vals[1], atol=1e-10)
        np.testing.assert_allclose(vals[0], vals[2], atol=1e-10)


class TestRobust:
    def test_soft_l1_ceres_formula(self):
        """rho_a(s) = 2 a^2 (sqrt(1 + s/a^2) - 1), rho'(0) = 1."""
        s = jnp.asarray([0.0, 0.5, 2.0, 100.0], jnp.float64)
        a = 1.5
        rho, w = robust.soft_l1(s, a)
        expected = 2 * a * a * (np.sqrt(1 + np.asarray(s) / a**2) - 1)
        np.testing.assert_allclose(np.asarray(rho), expected, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(w),
                                   1 / np.sqrt(1 + np.asarray(s) / a**2),
                                   rtol=1e-12)
        assert float(rho[0]) == 0.0
        assert float(w[0]) == 1.0

    def test_soft_l1_downweights_outliers(self):
        rho, w = robust.soft_l1(jnp.asarray([1e6]), 0.01)
        assert float(w[0]) < 1e-4

    def test_trivial(self):
        s = jnp.asarray([0.0, 3.0])
        rho, w = robust.trivial(s)
        np.testing.assert_allclose(np.asarray(rho), np.asarray(s))
        np.testing.assert_allclose(np.asarray(w), 1.0)


class TestSoftL1Norm:
    """Scale-normalized soft-L1 (the scipy-TRF formulation,
    ops/robust.soft_l1_norm): exactly soft_l1 / a^2 in both rho and
    weight, so the relative edge weighting is 1/a^2 — tighter edges
    trusted more."""

    def test_is_softl1_over_a2(self):
        import jax.numpy as jnp

        from mv_lm_icp_tpu.ops import robust

        s = jnp.asarray([0.0, 0.01, 1.0, 25.0])
        for a in [0.3, 1.0, 4.2]:
            rho_c, w_c = robust.soft_l1(s, a)
            rho_n, w_n = robust.soft_l1_norm(s, a)
            np.testing.assert_allclose(np.asarray(rho_n),
                                       np.asarray(rho_c) / a**2, rtol=1e-12)
            np.testing.assert_allclose(np.asarray(w_n),
                                       np.asarray(w_c) / a**2, rtol=1e-12)

    def test_matches_scipy_trf_cost(self):
        """cost = 0.5*sum(rho(s)) with residual r and scale a must equal
        scipy's 0.5*sum(soft_l1((r/a)^2)) elementwise."""
        import jax.numpy as jnp

        from mv_lm_icp_tpu.ops import robust

        r = np.asarray([0.0, 0.1, 2.0, -7.0])
        a = 1.7
        rho_n, _ = robust.soft_l1_norm(jnp.asarray(r * r), a)
        z = (r / a) ** 2
        scipy_rho = 2.0 * (np.sqrt(1.0 + z) - 1.0)
        np.testing.assert_allclose(np.asarray(rho_n), scipy_rho, rtol=1e-12)
