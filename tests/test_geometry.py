"""Unit tests for so3/quat/se3: round-trips, identities, and exact agreement
with the reference's conventions (Eigen xyzw quaternions, left-multiplicative
quaternion boxplus, right-multiplicative SE(3) boxplus, Sophus tangent order).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.ops import quat, se3, so3


def rand_rotvec(key, n=32, scale=2.5):
    return scale * jax.random.normal(key, (n, 3), dtype=jnp.float64)


class TestSO3:
    def test_exp_log_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(0))
        # keep |w| < pi for unique log
        w = w / jnp.maximum(1.0, jnp.linalg.norm(w, axis=-1, keepdims=True) / 3.0)
        R = so3.exp(w)
        np.testing.assert_allclose(so3.log(R), w, atol=1e-10)

    def test_exp_is_rotation(self):
        w = rand_rotvec(jax.random.PRNGKey(1))
        R = so3.exp(w)
        eyes = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eyes, atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)

    def test_small_angle(self):
        w = jnp.array([[1e-12, -1e-13, 1e-12], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-15)
        assert jnp.all(jnp.isfinite(so3.log(R)))

    def test_hat_vee(self):
        w = rand_rotvec(jax.random.PRNGKey(2))
        np.testing.assert_allclose(so3.vee(so3.hat(w)), w)
        v = rand_rotvec(jax.random.PRNGKey(3))
        np.testing.assert_allclose(
            jnp.einsum("nij,nj->ni", so3.hat(w), v), jnp.cross(w, v), atol=1e-12
        )

    def test_right_jacobian_fd(self):
        """exp(w + dw) ~= exp(w) exp(Jr(w) dw)."""
        w = jnp.array([0.3, -0.7, 0.5], dtype=jnp.float64)
        Jr = so3.right_jacobian(w)
        eps = 1e-7
        for k in range(3):
            dw = jnp.zeros(3, jnp.float64).at[k].set(eps)
            lhs = so3.exp(w + dw)
            rhs = so3.exp(w) @ so3.exp(Jr @ dw)
            np.testing.assert_allclose(lhs, rhs, atol=1e-12)

    def test_left_jacobian_inv(self):
        w = rand_rotvec(jax.random.PRNGKey(4), n=8, scale=1.0)
        V = so3.left_jacobian(w)
        Vinv = so3.left_jacobian_inv(w)
        eyes = jnp.broadcast_to(jnp.eye(3), V.shape)
        np.testing.assert_allclose(V @ Vinv, eyes, atol=1e-12)


class TestQuat:
    def test_matrix_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(5))
        R = so3.exp(w)
        q = quat.from_matrix(R)
        np.testing.assert_allclose(quat.to_matrix(q), R, atol=1e-12)

    def test_from_matrix_near_pi(self):
        """Shepperd extraction must be stable for theta ~ pi on any axis."""
        for axis in ([1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0.6, -0.8, 0]):
            w = (np.pi - 1e-7) * jnp.asarray(axis, jnp.float64)
            w = w / jnp.linalg.norm(w) * (np.pi - 1e-7)
            R = so3.exp(w)
            q = quat.from_matrix(R)
            np.testing.assert_allclose(quat.to_matrix(q), R, atol=1e-9)

    def test_rotate_matches_matrix(self):
        w = rand_rotvec(jax.random.PRNGKey(6))
        q = quat.from_axis_angle(w)
        R = quat.to_matrix(q)
        v = rand_rotvec(jax.random.PRNGKey(7))
        np.testing.assert_allclose(
            quat.rotate(q, v), jnp.einsum("nij,nj->ni", R, v), atol=1e-12
        )

    def test_multiply_matches_matrix_product(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(8))
        qa = quat.from_axis_angle(rand_rotvec(k1))
        qb = quat.from_axis_angle(rand_rotvec(k2))
        np.testing.assert_allclose(
            quat.to_matrix(quat.multiply(qa, qb)),
            quat.to_matrix(qa) @ quat.to_matrix(qb),
            atol=1e-12,
        )

    def test_axis_angle_roundtrip(self):
        w = rand_rotvec(jax.random.PRNGKey(9))
        w = w / jnp.maximum(1.0, jnp.linalg.norm(w, axis=-1, keepdims=True) / 3.0)
        q = quat.from_axis_angle(w)
        np.testing.assert_allclose(quat.to_axis_angle(q), w, atol=1e-10)
        np.testing.assert_allclose(quat.to_matrix(q), so3.exp(w), atol=1e-12)

    def test_boxplus_reference_semantics(self):
        """Plus(q, d) = [sin|d| d/|d|, cos|d|] * q (eigen_quaternion.h:89-106)."""
        q = quat.from_axis_angle(jnp.array([0.4, -0.2, 0.9], jnp.float64))
        d = jnp.array([0.12, 0.05, -0.3], jnp.float64)
        dn = jnp.linalg.norm(d)
        expected_delta_q = jnp.concatenate(
            [jnp.sin(dn) * d / dn, jnp.cos(dn)[None]]
        )
        np.testing.assert_allclose(
            quat.boxplus(q, d), quat.multiply(expected_delta_q, q), atol=1e-15
        )
        # boxplus(q, 0) == q
        np.testing.assert_allclose(quat.boxplus(q, jnp.zeros(3)), q, atol=1e-15)
        # stays unit norm
        assert abs(float(jnp.linalg.norm(quat.boxplus(q, d))) - 1.0) < 1e-12


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(10)
        tau = jax.random.normal(key, (16, 6), dtype=jnp.float64)
        x = se3.exp(tau)
        np.testing.assert_allclose(se3.log(x), tau, atol=1e-10)

    def test_exp_matches_matrix_exp(self):
        """Against scipy-style closed form via homogeneous matrix exp."""
        from scipy.linalg import expm

        tau = np.array([0.3, -0.1, 0.7, 0.4, -0.6, 0.2])
        Xi = np.zeros((4, 4))
        Xi[:3, :3] = np.asarray(so3.hat(jnp.asarray(tau[3:6])))
        Xi[:3, 3] = tau[:3]
        T_expected = expm(Xi)
        T = np.asarray(se3.to_matrix(se3.exp(jnp.asarray(tau))))
        np.testing.assert_allclose(T, T_expected, atol=1e-12)

    def test_compose_inverse_apply(self):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
        a = se3.exp(jax.random.normal(k1, (8, 6), dtype=jnp.float64))
        b = se3.exp(jax.random.normal(k2, (8, 6), dtype=jnp.float64))
        p = jax.random.normal(k3, (8, 3), dtype=jnp.float64)
        np.testing.assert_allclose(
            se3.apply(se3.compose(a, b), p),
            se3.apply(a, se3.apply(b, p)),
            atol=1e-12,
        )
        ident = se3.compose(a, se3.inverse(a))
        np.testing.assert_allclose(
            jnp.abs(ident[..., 3]), jnp.ones(8), atol=1e-12
        )
        np.testing.assert_allclose(ident[..., 4:7], 0.0, atol=1e-12)

    def test_boxplus_right_multiplicative(self):
        """boxplus(x, tau) == x * exp(tau) (sophus_se3.h:31-38)."""
        x = se3.exp(jnp.array([0.1, 0.2, -0.3, 0.5, -0.2, 0.8], jnp.float64))
        tau = jnp.array([0.01, -0.02, 0.03, -0.04, 0.05, 0.06], jnp.float64)
        np.testing.assert_allclose(
            se3.to_matrix(se3.boxplus(x, tau)),
            se3.to_matrix(x) @ se3.to_matrix(se3.exp(tau)),
            atol=1e-12,
        )

    def test_matrix_roundtrip(self):
        x = se3.exp(jax.random.normal(jax.random.PRNGKey(12), (5, 6), dtype=jnp.float64))
        x2 = se3.from_matrix(se3.to_matrix(x))
        # quaternions match up to sign
        dot = jnp.abs(jnp.sum(x[..., :4] * x2[..., :4], axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-12)
        np.testing.assert_allclose(x[..., 4:7], x2[..., 4:7], atol=1e-12)

    def test_pose_diff_zero(self):
        x = se3.exp(jnp.array([0.1, 0.2, -0.3, 0.5, -0.2, 0.8], jnp.float64))
        dt, dr = se3.pose_diff(x, x)
        assert float(dt) == 0.0
        assert float(dr) < 1e-5

    def test_pose_diff_known_angle(self):
        x = se3.identity(jnp.float64)
        y = se3.exp(jnp.array([0, 0, 0, 0.25, 0, 0], jnp.float64))
        dt, dr = se3.pose_diff(x, y)
        np.testing.assert_allclose(float(dr), np.degrees(0.25), rtol=1e-9)
        assert float(dt) == 0.0

    def test_add_noise_moments(self):
        """Noise model matches common.h:38-67: right-mult rotation noise,
        additive translation noise; zero sigma is exact identity."""
        x = se3.exp(jnp.array([0.1, 0.2, -0.3, 0.5, -0.2, 0.8], jnp.float64))
        same = se3.add_noise(jax.random.PRNGKey(0), x, 0.0, 0.0)
        np.testing.assert_allclose(same, x, atol=1e-15)
        noisy = se3.add_noise(jax.random.PRNGKey(1), x, 0.02, 0.01)
        dt, dr = se3.pose_diff(x, noisy)
        assert 0 < float(dt) < 0.1
        assert 0 < float(dr) < 10.0

    def test_jit_and_vmap(self):
        f = jax.jit(jax.vmap(se3.boxplus))
        x = jnp.tile(se3.identity(jnp.float64), (4, 1))
        tau = jnp.zeros((4, 6), jnp.float64)
        np.testing.assert_allclose(f(x, tau), x, atol=1e-15)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
