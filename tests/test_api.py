"""High-level API surface: register_pair / register_multiview."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mv_lm_icp_tpu as mv
from mv_lm_icp_tpu.ops import se3
from tests.test_multiview import synthetic_frameset


def pair_problem(seed=0, n=400):
    key = jax.random.PRNGKey(seed)
    src = jax.random.normal(key, (n, 3), jnp.float64)
    nor = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3),
                            jnp.float64)
    nor = nor / jnp.linalg.norm(nor, axis=-1, keepdims=True)
    gt = se3.exp(jnp.asarray([0.3, -0.1, 0.2, 0.3, -0.4, 0.2], jnp.float64))
    return src, se3.apply(gt, src), se3.rotate_only(gt, nor), gt


@pytest.mark.parametrize("method", ["lm", "closedform", "gicp"])
def test_register_pair_methods(method):
    src, dst, nor, gt = pair_problem()
    pose = mv.register_pair(src, dst, method=method)
    dt, dr = se3.pose_diff(gt, pose)
    assert float(dt) < 1e-8, (method, float(dt))


def test_register_pair_refine():
    """refine=N polishes the f32 solve to f64 accuracy."""
    src64, dst64, nor64, gt = pair_problem(seed=3, n=1500)
    src, dst, nor = (a.astype(jnp.float32) for a in (src64, dst64, nor64))
    p32 = mv.register_pair(src, dst, nor)
    pref = mv.register_pair(src64, dst64, nor64, refine=3)
    dt32, _ = se3.pose_diff(gt, p32.astype(jnp.float64))
    dt, _ = se3.pose_diff(gt, pref)
    assert pref.dtype == jnp.float64
    assert float(dt) < 1e-11 and float(dt) < float(dt32)


def test_register_pair_p2pl_defaults_from_normals():
    src, dst, nor, gt = pair_problem(seed=2)
    pose = mv.register_pair(src, dst, normals=nor)
    dt, dr = se3.pose_diff(gt, pose)
    assert float(dt) < 1e-8


@pytest.mark.parametrize("param", ["se3", "quat", "angle_axis"])
def test_register_pair_parameterizations(param):
    src, dst, nor, gt = pair_problem(seed=3)
    pose = mv.register_pair(src, dst, parameterization=param)
    dt, _ = se3.pose_diff(gt, pose)
    assert float(dt) < 1e-8


def test_register_multiview_from_frameset():
    fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02, seed=31)
    from mv_lm_icp_tpu.utils import metrics

    rmse0 = metrics.alignment_rmse(fs)
    fs2, hist = mv.register_multiview(fs, rounds=6, cutoff=1.0,
                                      metric="point_to_point",
                                      robust=False)
    assert metrics.alignment_rmse(fs2) < rmse0 * 1e-2
    assert len(hist) == 6


def test_register_multiview_from_cloud_list():
    """Clouds-only entry: two identical clouds offset by a small pose;
    expect the solver to fuse them (poses converge toward each other)."""
    rng = np.random.default_rng(4)
    base = rng.normal(size=(300, 3))
    offset = np.asarray(
        se3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.04, -0.02, 0.03],
                            jnp.float64)))
    cloud2 = np.asarray(se3.apply(jnp.asarray(offset), jnp.asarray(base)))
    fs, hist = mv.register_multiview(
        [base, cloud2], rounds=6, cutoff=1.0, metric="point_to_point",
        robust=False, knn=1, dtype=jnp.float64)
    # frame 1's pose should now map cloud2 onto cloud1: pose ~= offset^-1
    expected = se3.inverse(jnp.asarray(offset))
    dt, dr = se3.pose_diff(fs.poses[1], expected)
    assert float(dt) < 1e-6, float(dt)
