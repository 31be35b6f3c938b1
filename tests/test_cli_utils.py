"""CLI smoke tests (CPU, tiny workloads) + timer/checkpoint/export units."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.utils import checkpoint, export, metrics
from mv_lm_icp_tpu.utils.timer import Timer
from tests.test_multiview import synthetic_frameset

HAVE_SAMPLES = os.path.isdir("/root/reference/samples/Bunny_RealData")
needs_samples = pytest.mark.skipif(not HAVE_SAMPLES,
                                   reason="reference samples not mounted")


class TestTimer:
    def test_tic_toc_accumulates(self):
        t = Timer()
        t.tic()
        t.toc("a")
        t.tic()
        t.toc("a")
        assert "a" in t.timings and t.timings["a"] >= 0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        fs = synthetic_frameset(F=3, N=64)
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save(path, fs, round_idx=7)
        fs_moved = fs.replace(poses=fs.poses * 0 + 1)
        fs2, rnd, _ = checkpoint.restore(path, fs_moved)
        assert rnd == 7
        np.testing.assert_allclose(np.asarray(fs2.poses),
                                   np.asarray(fs.poses))


class TestExport:
    def test_xyz_and_ply(self, tmp_path):
        fs = synthetic_frameset(F=3, N=64)
        n1 = export.write_xyz(str(tmp_path / "scene.xyz"), fs)
        assert n1 == 3 * 64
        data = np.loadtxt(tmp_path / "scene.xyz")
        assert data.shape == (192, 6)
        n2 = export.write_ply(str(tmp_path / "scene.ply"), fs,
                              include_gt=True)
        assert n2 == 2 * 192
        head = open(tmp_path / "scene.ply").read(200)
        assert head.startswith("ply") and "element vertex 384" in head


class TestViz:
    def test_render_scene_png(self, tmp_path):
        pytest.importorskip("matplotlib")
        from mv_lm_icp_tpu.models import frameset
        from mv_lm_icp_tpu.utils import viz

        fs = synthetic_frameset(F=3, N=64)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        import numpy as _np

        path = viz.render_scene(
            fs, edges=edges, weights=_np.ones(edges.shape[0]),
            path=str(tmp_path / "scene.png"), show_normals=True,
            title="test")
        assert (tmp_path / "scene.png").stat().st_size > 10_000

    def test_render_turntable_gif(self, tmp_path):
        """Animated-GIF orbit (the viewer's spin, Visualize.cpp:627-757):
        a multi-frame GIF must land on disk."""
        pytest.importorskip("matplotlib")
        pytest.importorskip("PIL")
        from mv_lm_icp_tpu.models import frameset
        from mv_lm_icp_tpu.utils import viz

        fs = synthetic_frameset(F=3, N=64)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        path = viz.render_turntable(fs, str(tmp_path / "orbit.gif"),
                                    n_views=4, edges=edges)
        from PIL import Image

        im = Image.open(path)
        assert getattr(im, "n_frames", 1) == 4

    def test_render_correspondence_lines(self, tmp_path):
        """Selected-edge correspondence rendering (Visualize.cpp:412-481):
        the corr_edge layer must add strokes to the figure (file strictly
        larger than the same render without it)."""
        pytest.importorskip("matplotlib")
        from mv_lm_icp_tpu.models import correspond, frameset
        from mv_lm_icp_tpu.utils import viz

        fs = synthetic_frameset(F=3, N=64)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=10.0,
                                               chunk=64)
        # frame 0 is gauge-fixed so its outgoing edges carry no valid
        # matches by default — select the first edge that does
        per_edge = np.sum(np.asarray(corr.valid), axis=1)
        k = int(np.argmax(per_edge))
        assert per_edge[k] > 0
        viz.render_scene(fs, edges=edges, path=str(tmp_path / "base.png"))
        viz.render_scene(fs, edges=edges, corr=corr, corr_edge=k,
                         path=str(tmp_path / "corr.png"))
        assert (tmp_path / "corr.png").stat().st_size > \
            (tmp_path / "base.png").stat().st_size

    def test_snapshot_callback(self, tmp_path):
        pytest.importorskip("matplotlib")
        from mv_lm_icp_tpu.models import frameset, pipeline
        from mv_lm_icp_tpu.utils import viz

        fs = synthetic_frameset(F=3, N=64)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        cfg = pipeline.ICPConfig(rounds=2, knn=2, cutoff=1.0,
                                 metric="point_to_point", robust=False,
                                 nn_chunk=64)
        pipeline.run_icp(fs, cfg,
                         callback=viz.snapshot_callback(str(tmp_path),
                                                        edges=edges))
        assert (tmp_path / "round_000.png").exists()
        assert (tmp_path / "round_001.png").exists()


class TestMetrics:
    def test_summary_format(self):
        s = metrics.summary([1.0, 2.0, 3.0, 4.0], "vals")
        assert "Summary of 4 vals" in s and "Med" in s

    def test_alignment_rmse_zero_at_gt(self):
        fs = synthetic_frameset(F=3, N=64)
        fs = fs.replace(poses=fs.gt_poses)
        assert metrics.alignment_rmse(fs) < 1e-12


@needs_samples
class TestCLISmoke:
    def test_pairwise_cli(self, capsys):
        from mv_lm_icp_tpu.cli import pairwise

        pairwise.main(["--dtype", "float64", "--no-ceres"])
        out = capsys.readouterr().out
        assert "closed form" in out and "diff_tra" in out

    def test_pairwise_cli_refine(self, capsys):
        """--refine appends the f64-polished SE3 row and it must hit the
        reference's double-precision magnitudes (README.md:142-150)."""
        import re

        from mv_lm_icp_tpu.cli import pairwise

        pairwise.main(["--pointToPlane", "--refine"])
        out = capsys.readouterr().out
        m = re.search(r"f64 refine\s+diff_tra:([0-9.e+-]+)", out)
        assert m, out
        assert float(m.group(1)) < 1e-11, out

    def test_multiview_cli(self, capsys, tmp_path):
        from mv_lm_icp_tpu.cli import multiview

        ply = str(tmp_path / "out.ply")
        multiview.main([
            "--limit", "3", "--step", "2", "--rounds", "2",
            "--point-stride", "16", "--dtype", "float64",
            "--no-recomputeNormals", "--export-ply", ply,
            "--checkpoint", str(tmp_path / "ck.npz"),
        ])
        out = capsys.readouterr().out
        assert "graph adjacency matrix" in out
        assert "final alignment RMSE" in out
        assert os.path.exists(ply)
        # resume path
        multiview.main([
            "--limit", "3", "--step", "2", "--rounds", "3",
            "--point-stride", "16", "--dtype", "float64",
            "--no-recomputeNormals",
            "--checkpoint", str(tmp_path / "ck.npz"),
        ])
        out2 = capsys.readouterr().out
        assert "resumed" in out2

    def test_multiview_cli_posegraph(self, capsys):
        from mv_lm_icp_tpu.cli import multiview

        multiview.main([
            "--limit", "2", "--step", "2", "--rounds", "1", "--g2o",
            "--point-stride", "32", "--dtype", "float64",
            "--no-recomputeNormals",
        ])
        out = capsys.readouterr().out
        assert "chi2" in out


class TestPlyLoader:
    def test_load_ply_roundtrip(self, tmp_path):
        from mv_lm_icp_tpu.utils import io

        pts = np.random.default_rng(5).normal(size=(20, 3))
        p = tmp_path / "c.ply"
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\n"
                    f"element vertex {len(pts)}\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n")
            for row in pts:
                f.write(f"{row[0]:.8f} {row[1]:.8f} {row[2]:.8f}\n")
        got = io.load_ply(str(p))
        np.testing.assert_allclose(got, pts, atol=1e-7)


class TestFrustaExport:
    def test_write_pose_frusta(self, tmp_path):
        fs = synthetic_frameset(F=3, N=16)
        path = str(tmp_path / "frusta.ply")
        n = export.write_pose_frusta_ply(path, fs)
        assert n == 2 * 3 * 5  # est + gt, 5 verts per frustum
        head = open(path).read(400)
        assert "element edge 48" in head


@needs_samples
class TestCLIFusedAndTrace:
    def test_multiview_cli_fused(self, capsys):
        from mv_lm_icp_tpu.cli import multiview

        multiview.main([
            "--limit", "3", "--step", "2", "--rounds", "2", "--fused",
            "--point-stride", "16", "--dtype", "float64",
            "--no-recomputeNormals",
        ])
        out = capsys.readouterr().out
        assert "fused rounds" in out and "final alignment RMSE" in out

    def test_multiview_cli_trace(self, capsys, tmp_path):
        from mv_lm_icp_tpu.cli import multiview

        tdir = str(tmp_path / "trace")
        multiview.main([
            "--limit", "2", "--step", "2", "--rounds", "1",
            "--point-stride", "32", "--dtype", "float64",
            "--no-recomputeNormals", "--trace", tdir,
        ])
        assert os.path.isdir(tdir) and os.listdir(tdir)
