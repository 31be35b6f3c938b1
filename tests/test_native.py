"""Native host library: build, parse exactness, grid-NN exactness vs
brute force."""
import os

import numpy as np
import pytest

from mv_lm_icp_tpu.utils import native

HAVE_SAMPLES = os.path.isdir("/root/reference/samples/Bunny_RealData")


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")


class TestParse:
    def test_parse_matches_numpy(self, tmp_path):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(100, 6))
        p = tmp_path / "t.xyz"
        np.savetxt(p, data, fmt="%.8g")
        got = native.parse_floats_file(str(p))
        np.testing.assert_allclose(got.reshape(-1, 6), data, rtol=1e-7)

    @pytest.mark.skipif(not HAVE_SAMPLES, reason="no samples")
    def test_parse_bunny_matches_numpy(self):
        path = "/root/reference/samples/Bunny_RealData/cloudXYZ_0.xyz"
        a = native.parse_floats_file(path)
        b = np.fromfile(path, dtype=np.float64, sep=" ")
        np.testing.assert_array_equal(a, b)

    def test_io_loader_uses_native(self, tmp_path):
        from mv_lm_icp_tpu.utils import io

        rng = np.random.default_rng(1)
        data = rng.normal(size=(50, 6))
        p = tmp_path / "c.xyz"
        np.savetxt(p, data, fmt="%.8g")
        pts, nor = io.load_xyz(str(p))
        np.testing.assert_allclose(pts, data[:, :3], rtol=1e-7)

    def test_missing_file(self):
        with pytest.raises(IOError):
            native.parse_floats_file("/nonexistent/file.xyz")


class TestGridNN:
    def test_exact_within_cell(self):
        rng = np.random.default_rng(2)
        q = rng.normal(size=(500, 3))
        r = rng.normal(size=(800, 3))
        cell = 0.5
        idx, d2 = native.nn_grid(q, r, cell)
        # brute force oracle
        full = np.sum((q[:, None] - r[None]) ** 2, axis=-1)
        bidx = full.argmin(1)
        bd2 = full.min(1)
        within = bd2 <= cell * cell
        np.testing.assert_array_equal(idx[within], bidx[within])
        np.testing.assert_allclose(d2[within], bd2[within], rtol=1e-12)
        assert (idx[~within] == -1).all()

    def test_cutoff_semantics_match_pipeline(self):
        """cell == cutoff reproduces exactly the kept correspondences."""
        rng = np.random.default_rng(3)
        r = rng.normal(size=(600, 3)) * 0.2
        q = r + rng.normal(size=(600, 3)) * 0.01
        cutoff = 0.05
        idx, d2 = native.nn_grid(q, r, cutoff)
        full = np.sum((q[:, None] - r[None]) ** 2, axis=-1)
        keep = full.min(1) < cutoff ** 2
        got_keep = (idx >= 0) & (d2 < cutoff ** 2)
        np.testing.assert_array_equal(got_keep, keep)
        np.testing.assert_array_equal(idx[keep], full.argmin(1)[keep])

    def test_empty_ref(self):
        q = np.zeros((4, 3))
        idx, d2 = native.nn_grid(q, np.zeros((0, 3)), 0.1)
        assert (idx == -1).all()
