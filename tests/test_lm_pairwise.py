"""Pairwise LM solver: synthetic ground-truth round-trips (the reference's
de-facto unit test, SURVEY §4.1) for every parameterization x metric, plus
robust-loss and masking behaviour. Reference accuracy bar: Ceres recovers
diff_tra ~1e-11, diff_rot ~1.7e-6 deg within <=50 LM iterations
(BASELINE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.ops import se3
from mv_lm_icp_tpu.solvers import lm


def make_problem(seed=0, n=600, dtype=jnp.float64):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    src = jax.random.normal(k1, (n, 3), dtype)
    nor = jax.random.normal(k2, (n, 3), dtype)
    nor = nor / jnp.linalg.norm(nor, axis=-1, keepdims=True)
    gt = se3.exp(jax.random.normal(k3, (6,), dtype) *
                 jnp.asarray([0.5, 0.5, 0.5, 0.4, 0.4, 0.4], dtype))
    dst = se3.apply(gt, src)
    nor_dst = se3.rotate_only(gt, nor)
    return src, dst, nor_dst, gt


@pytest.mark.parametrize("param_name", ["se3", "quat", "angle_axis"])
@pytest.mark.parametrize("metric", ["point_to_point", "point_to_plane"])
class TestSolvePairwise:
    def test_recovers_gt(self, param_name, metric):
        src, dst, nor, gt = make_problem()
        # the solvers register src onto dst: residual g(src) - dst
        est, stats = lm.solve_pairwise(
            src, dst, nor, param_name=param_name, metric=metric)
        dt, dr = se3.pose_diff(gt, est)
        assert float(dt) < 1e-9, (float(dt), int(stats.iterations))
        assert float(dr) < 1e-5, (float(dr), int(stats.iterations))
        assert int(stats.iterations) <= 50
        assert bool(stats.converged)

    def test_autodiff_matches_analytic(self, param_name, metric):
        src, dst, nor, gt = make_problem(seed=1, n=200)
        est_a, _ = lm.solve_pairwise(
            src, dst, nor, param_name=param_name, metric=metric,
            use_autodiff=False)
        est_d, _ = lm.solve_pairwise(
            src, dst, nor, param_name=param_name, metric=metric,
            use_autodiff=True)
        dt, dr = se3.pose_diff(est_a, est_d)
        assert float(dt) < 1e-8
        assert float(dr) < 1e-4


class TestRefinePairwise:
    """Mixed-precision path: the f32 solve polished by a few f64
    Gauss-Newton steps must reach the reference's double-precision
    magnitudes (README.md:142-150: diff_tra ~6e-11)."""

    @pytest.mark.parametrize("metric", ["point_to_point", "point_to_plane"])
    def test_f32_plus_refine_hits_f64_accuracy(self, metric):
        src64, dst64, nor64, gt = make_problem(seed=4, n=2000)
        src, dst, nor = (a.astype(jnp.float32) for a in (src64, dst64,
                                                         nor64))
        est32, _ = lm.solve_pairwise(src, dst, nor, param_name="se3",
                                     metric=metric)
        dt32, _ = se3.pose_diff(gt, est32.astype(jnp.float64))
        est, costs = lm.refine_pairwise(est32, src64, dst64, nor64,
                                        metric=metric, iters=3)
        assert est.dtype == jnp.float64
        dt, dr = se3.pose_diff(gt, est)
        assert float(dt) < 1e-11, (float(dt), float(dt32))
        assert float(dr) < 1e-5
        # the polish must actually improve on the f32 fixed point
        assert float(dt) < float(dt32) * 1e-2

    def test_refine_is_fixed_point_at_optimum(self):
        """Refining an already-exact pose must not move it."""
        src, dst, nor, gt = make_problem(seed=5, n=500)
        est, _ = lm.refine_pairwise(gt, src, dst, nor,
                                    metric="point_to_plane", iters=2)
        dt, dr = se3.pose_diff(gt, est)
        assert float(dt) < 1e-13 and float(dr) < 1e-6


class TestRobustAndMasking:
    def test_masked_equals_pruned(self):
        src, dst, nor, gt = make_problem(seed=2, n=300)
        w = np.random.default_rng(0).random(300) > 0.3
        est_m, _ = lm.solve_pairwise(src, dst, nor, weights=jnp.asarray(w),
                                     metric="point_to_plane")
        est_d, _ = lm.solve_pairwise(src[np.where(w)[0]],
                                     dst[np.where(w)[0]],
                                     nor[np.where(w)[0]],
                                     metric="point_to_plane")
        dt, dr = se3.pose_diff(est_m, est_d)
        assert float(dt) < 1e-10
        assert float(dr) < 1e-6

    def test_soft_l1_rejects_outliers(self):
        src, dst, nor, gt = make_problem(seed=3, n=500)
        rng = np.random.default_rng(1)
        dst_np = np.array(dst)
        out = rng.random(500) < 0.15
        dst_np[out] += rng.normal(scale=2.0, size=(out.sum(), 3))
        dst_bad = jnp.asarray(dst_np)
        est_plain, _ = lm.solve_pairwise(src, dst_bad)
        est_rob, _ = lm.solve_pairwise(src, dst_bad, loss="soft_l1",
                                       loss_scale=0.05)
        dt_p, dr_p = se3.pose_diff(gt, est_plain)
        dt_r, dr_r = se3.pose_diff(gt, est_rob)
        assert float(dt_r) < float(dt_p) * 0.2
        assert float(dt_r) < 5e-3

    def test_warm_start(self):
        """x0 near the solution converges in very few iterations."""
        src, dst, nor, gt = make_problem(seed=4)
        est, stats = lm.solve_pairwise(src, dst, x0=gt)
        assert int(stats.iterations) <= 3
        dt, _ = se3.pose_diff(gt, est)
        assert float(dt) < 1e-10

    def test_matches_closedform(self):
        """LM and Eggert SVD agree on the same correspondences (the
        reference's cross-solver agreement oracle, SURVEY §4.2)."""
        from mv_lm_icp_tpu.solvers import closedform

        src, dst, nor, gt = make_problem(seed=5)
        est_lm, _ = lm.solve_pairwise(src, dst)
        est_cf = closedform.point_to_point(src, dst)
        dt, dr = se3.pose_diff(est_lm, est_cf)
        assert float(dt) < 1e-9
        assert float(dr) < 1e-5


class TestTerminationReasons:
    """FullReport-equivalent termination reporting (icp-ceres.cpp:91-95):
    the reason enum must name WHY the solve stopped, and the pairwise
    fixture must converge within the reference's <=50-iteration budget
    (icp-ceres.cpp:51) by an actual tolerance, not the budget."""

    def test_converged_reason_and_budget_parity(self):
        src, dst, nor, gt = make_problem()
        pose, stats = lm.solve_pairwise(src, dst, nor, param_name="se3",
                                        metric="point_to_plane")
        assert bool(stats.converged)
        assert int(stats.iterations) <= 50
        assert lm.reason_str(stats) in (
            lm.TERMINATION_REASONS[lm.REASON_FUNCTION_TOLERANCE],
            lm.TERMINATION_REASONS[lm.REASON_GRADIENT_TOLERANCE],
            lm.TERMINATION_REASONS[lm.REASON_PARAMETER_TOLERANCE])

    def test_max_iterations_reason(self):
        src, dst, nor, gt = make_problem()
        cfg = lm.LMConfig(max_iterations=1, function_tolerance=0.0,
                          gradient_tolerance=0.0, parameter_tolerance=0.0)
        _, stats = lm.solve_pairwise(src, dst, nor, param_name="se3",
                                     metric="point_to_plane", config=cfg)
        assert not bool(stats.converged)
        assert int(stats.reason) == lm.REASON_MAX_ITERATIONS
        assert "max iterations" in lm.reason_str(stats)

    def test_report_string(self):
        src, dst, nor, gt = make_problem()
        _, stats = lm.solve_pairwise(src, dst, nor)
        rep = lm.report(stats)
        assert "termination=" in rep and "iterations=" in rep

    def test_rejection_limit_reason(self):
        """g2o's maxTrialsAfterFailure cut: with every step rejected
        (min_relative_decrease > 1), the solve must stop after exactly
        the configured number of consecutive rejections."""
        src, dst, nor, gt = make_problem()
        cfg = lm.LMConfig(max_iterations=50, min_relative_decrease=2.0,
                          gradient_tolerance=0.0,
                          max_consecutive_rejections=4)
        _, stats = lm.solve_pairwise(src, dst, nor, param_name="se3",
                                     metric="point_to_plane", config=cfg)
        assert int(stats.reason) == lm.REASON_REJECTION_LIMIT
        assert int(stats.iterations) == 4

    def test_tr_state_continuation(self):
        """A solve continued from a collapsed trust region must do zero
        iterations and leave the pose untouched."""
        import jax.numpy as jnp

        from mv_lm_icp_tpu.ops import residuals as res_mod

        src, dst, nor, gt = make_problem()
        param = res_mod.PARAMS["se3"]
        system = lm.make_pairwise_system(param, "point_to_plane", src, dst,
                                         nor)
        x0 = param.from_pose7(jnp.zeros(7, src.dtype).at[3].set(1.0))
        x, stats = lm.lm_solve(x0, system, param.boxplus,
                               tr_state=(1e-40, 2.0))
        assert int(stats.iterations) == 0
        assert int(stats.reason) == lm.REASON_RADIUS_COLLAPSED
        np.testing.assert_array_equal(np.asarray(x), np.asarray(x0))
        # final tr state is returned for chaining
        assert float(stats.radius) < 1e-32
