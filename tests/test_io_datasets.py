"""IO/dataset tests against the actual sample data shipped with the
reference (read-only fixtures)."""
import os

import numpy as np
import pytest

from mv_lm_icp_tpu.utils import datasets, io

BUNNY = datasets.BUNNY_DIR
DINO = datasets.DINOSAUR_DIR
HAVE_SAMPLES = os.path.isdir(BUNNY)

needs_samples = pytest.mark.skipif(not HAVE_SAMPLES,
                                   reason="reference samples not mounted")


@needs_samples
class TestIO:
    def test_load_xyz_bunny(self):
        pts, nor = io.load_xyz(f"{BUNNY}/cloudXYZ_0.xyz")
        assert pts.shape == nor.shape
        assert pts.shape[1] == 3
        # README says ~16.7k points; file has 16264 rows (no trailing-garbage
        # point, unlike the reference loader, SURVEY §7.4)
        assert 16000 < pts.shape[0] < 17000
        assert np.isfinite(pts).all() and np.isfinite(nor).all()
        # first row of the file
        np.testing.assert_allclose(pts[0], [-0.076899, -0.081785, 0.421])
        # normals are unit-ish
        norms = np.linalg.norm(nor, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-2)

    def test_load_matrix4d_full(self):
        m = io.load_matrix4d(f"{BUNNY}/poses_0.txt")
        assert m.shape == (4, 4)
        np.testing.assert_allclose(m[3], [0, 0, 0, 1])
        np.testing.assert_allclose(m[0, 0], 0.9583414)
        # approximately a rotation (the sample files store only 7 decimal
        # digits and are off-orthonormal by ~7e-3)
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=2e-2)

    def test_load_matrix4d_3x4(self):
        """Dinosaur pose files are 3x4; bottom row must default to 0001
        (loadMatrix4d zeros + [15]=1, common.h:180-182)."""
        m = io.load_matrix4d(f"{DINO}/pose_1.txt")
        np.testing.assert_allclose(m[3], [0, 0, 0, 1])
        np.testing.assert_allclose(m[0, 0], 0.99171)

    def test_discover_ordering(self):
        files = io.discover(BUNNY, "cloud")
        names = [os.path.basename(f) for f in files]
        assert names[0] == "cloudXYZ_0.xyz"
        assert names[1] == "cloudXYZ_1.xyz"
        # length-then-lex: single digits before double digits
        assert names.index("cloudXYZ_9.xyz") < names.index("cloudXYZ_10.xyz")
        assert len(files) == 36


@needs_samples
class TestDatasets:
    def test_bunny_load_semantics(self):
        raw = datasets.load_raw_frames(BUNNY, limit=4, step=2,
                                       sigma=0.02, sigmat=0.01, seed=0)
        assert len(raw.points) == 4
        assert raw.poses.shape == (4, 7)
        # bunny has no groundtruth files: gt comes from poses_*.txt and
        # frame 0's estimate is exact (main_multiview.cpp:78-85)
        np.testing.assert_allclose(raw.poses[0], raw.gt_poses[0])
        assert not np.allclose(raw.poses[1], raw.gt_poses[1])

    def test_dinosaur_load_semantics(self):
        raw = datasets.load_raw_frames(DINO, limit=5, step=1)
        assert len(raw.points) == 5
        # dinosaur has separate groundtruth: pose != gt, both from files
        assert not np.allclose(raw.poses[1], raw.gt_poses[1])

    def test_fake_mode(self):
        raw = datasets.load_raw_frames(BUNNY, limit=3, step=1, fake=True)
        np.testing.assert_array_equal(raw.points[0], raw.points[2])

    def test_padding(self):
        raw = datasets.load_raw_frames(DINO, limit=3, step=1)
        pts, nor, mask = datasets.pad_clouds(raw.points, raw.normals)
        F, N, _ = pts.shape
        assert F == 3 and N % 256 == 0
        for f in range(3):
            k = raw.points[f].shape[0]
            assert mask[f, :k].all() and not mask[f, k:].any()
            np.testing.assert_array_equal(pts[f, :k], raw.points[f])
            # padding is far away
            assert (np.abs(pts[f, k:]) > 1e5).all() or k == N

    def test_synthetic_pose_matches_reference_construction(self):
        """q = AA(pi/4,X)*AA(1,Y)*AA(-0.2,Z) (main_pairwise.cpp:44-47)."""
        import jax.numpy as jnp

        from mv_lm_icp_tpu.ops import se3, so3

        x = datasets.synthetic_pairwise_pose()
        R_expected = (
            np.asarray(so3.exp(jnp.array([np.pi / 4, 0, 0.0])))
            @ np.asarray(so3.exp(jnp.array([0.0, 1.0, 0.0])))
            @ np.asarray(so3.exp(jnp.array([0.0, 0.0, -0.2])))
        )
        R, t = se3.to_Rt(x)
        np.testing.assert_allclose(np.asarray(R), R_expected, atol=1e-12)
        np.testing.assert_allclose(np.asarray(t), [0.01, -0.01, -0.005])
