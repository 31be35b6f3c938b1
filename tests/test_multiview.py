"""Multiview ICP: graph construction, correspondence semantics, joint
solve with gauge fixing, and noise-injection convergence (the reference's
de-facto system test, SURVEY §4.3)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.models import correspond, frameset, pipeline
from mv_lm_icp_tpu.ops import se3
from mv_lm_icp_tpu.solvers import multiview as mv
from mv_lm_icp_tpu.utils import datasets, metrics

HAVE_SAMPLES = os.path.isdir(datasets.BUNNY_DIR)
needs_samples = pytest.mark.skipif(not HAVE_SAMPLES,
                                   reason="reference samples not mounted")


def synthetic_frameset(F=5, N=400, sigma=0.05, sigmat=0.03, seed=0,
                       dtype=jnp.float64):
    """FLAGS_fake-style fixture: every frame is the same geometry, GT poses
    form a chain, estimates are noised (frame 0 exact)."""
    key = jax.random.PRNGKey(seed)
    kp, kn, kposes, knoise = jax.random.split(key, 4)
    base = jax.random.normal(kp, (N, 3), dtype)
    nor = jax.random.normal(kn, (N, 3), dtype)
    nor = nor / jnp.linalg.norm(nor, axis=-1, keepdims=True)
    # chain of small relative motions
    taus = 0.3 * jax.random.normal(kposes, (F, 6), dtype)
    gt = [se3.identity(dtype)]
    for i in range(1, F):
        gt.append(se3.compose(gt[-1], se3.exp(0.3 * taus[i])))
    gt = jnp.stack(gt)
    noise_keys = jax.random.split(knoise, F)
    noisy = jax.vmap(lambda k, x: se3.add_noise(k, x, sigma, sigmat))(
        noise_keys, gt)
    poses = jnp.concatenate([gt[:1], noisy[1:]], axis=0)
    # each frame stores the shared global scene in its LOCAL coordinates,
    # so that at GT poses the global scenes coincide exactly
    inv_gt = jax.vmap(se3.inverse)(gt)
    pts_local = jax.vmap(lambda g: se3.apply(g, base))(inv_gt)
    nor_local = jax.vmap(lambda g: se3.rotate_only(g, nor))(inv_gt)
    return frameset.FrameSet(
        points=pts_local,
        normals=nor_local,
        valid=jnp.ones((F, N), bool),
        poses=poses,
        gt_poses=gt,
        fixed=jnp.asarray(np.arange(F) == 0),
    )


class TestGraph:
    def test_knn_graph_chain(self):
        """Frames on a line with k=2 -> each connects to its 2 nearest."""
        t = np.zeros((5, 7))
        t[:, 3] = 1.0
        t[:, 4] = np.arange(5)  # x positions 0..4
        edges = frameset.knn_pose_graph(jnp.asarray(t), 2)
        A = frameset.adjacency_matrix(edges, 5)
        expected = np.zeros((5, 5), int)
        for i in range(5):
            ds = [(abs(i - j), j) for j in range(5) if j != i]
            for _, j in sorted(ds)[:2]:
                expected[i, j] = 1
        # interior frames connect to both sides; ends to the 2 nearest
        np.testing.assert_array_equal(A, expected)

    def test_edges_shape_order(self):
        t = np.random.default_rng(0).normal(size=(7, 7))
        edges = frameset.knn_pose_graph(jnp.asarray(t), 3)
        e = np.asarray(edges)
        assert e.shape == (21, 2)
        np.testing.assert_array_equal(e[:, 0], np.repeat(np.arange(7), 3))
        assert (e[:, 0] != e[:, 1]).all()


class TestCorrespondences:
    def test_exact_alignment_self_match(self):
        """With GT poses, each src point's NN is itself (identical clouds)
        at distance ~0."""
        fs = synthetic_frameset()
        fs = fs.replace(poses=fs.gt_poses)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=0.05)
        e = np.asarray(edges)
        live = e[:, 0] != 0  # frame 0 fixed -> no correspondences
        idx = np.asarray(corr.nn_idx)[live]
        np.testing.assert_array_equal(
            idx, np.tile(np.arange(fs.num_points), (live.sum(), 1)))
        assert np.asarray(corr.dist)[live].max() < 1e-6
        assert np.asarray(corr.valid)[live].all()

    def test_median_prune(self):
        """prune=True keeps exactly the valid matches with
        dist <= 1.5*median — the reference's commented-out rejection
        (frame.cpp:178-183)."""
        fs = synthetic_frameset(F=4, N=256, sigma=0.03, sigmat=0.02,
                                seed=9)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        base = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                               chunk=128)
        pruned = correspond.find_correspondences(fs, edges, cutoff=1.0,
                                                 chunk=128, prune=True)
        np.testing.assert_array_equal(np.asarray(pruned.weight),
                                      np.asarray(base.weight))
        v0 = np.asarray(base.valid)
        v1 = np.asarray(pruned.valid)
        d = np.asarray(base.dist)
        w = np.asarray(base.weight)[:, None]
        assert (v1 <= v0).all()                       # subset
        np.testing.assert_array_equal(v1, v0 & (d <= w))
        assert v1.sum() < v0.sum()                    # actually rejects

    def test_fixed_frame_produces_nothing(self):
        fs = synthetic_frameset()
        edges = frameset.knn_pose_graph(fs.poses, 2)
        corr = correspond.find_correspondences(fs, edges, cutoff=0.05)
        e = np.asarray(edges)
        fixed_rows = e[:, 0] == 0
        assert not np.asarray(corr.valid)[fixed_rows].any()

    def test_cutoff_prunes(self):
        fs = synthetic_frameset(sigma=0.0, sigmat=0.0)
        # shift frame 1 far away: nothing within cutoff
        poses = np.array(fs.poses)
        poses[1, 4:7] += 100.0
        fs = fs.replace(poses=jnp.asarray(poses),
                        gt_poses=jnp.asarray(poses))
        edges = jnp.asarray([[1, 2]], jnp.int32)
        corr = correspond.find_correspondences(fs, edges, cutoff=0.05)
        assert not np.asarray(corr.valid).any()
        # weight falls back to 1.5 * fallback median
        assert np.isfinite(float(corr.weight[0]))

    def test_weight_median_semantics(self):
        """weight == 1.5 * upper-median of kept distances (frame.cpp:176)."""
        fs = synthetic_frameset(F=3, N=64, sigma=0.01, sigmat=0.005)
        edges = jnp.asarray([[1, 0]], jnp.int32)
        corr = correspond.find_correspondences(fs, edges, cutoff=1e9)
        d = np.asarray(corr.dist[0])
        v = np.asarray(corr.valid[0])
        kept = np.sort(d[v])
        expected = 1.5 * kept[len(kept) // 2]
        np.testing.assert_allclose(float(corr.weight[0]), expected,
                                   rtol=1e-6)


@pytest.mark.parametrize("param_name", ["se3", "quat", "angle_axis"])
class TestJointSolve:
    def test_perfect_correspondences_recover_gt(self, param_name):
        """With exact correspondences, one joint LM solve returns all poses
        to GT (multiview analogue of the pairwise round-trip)."""
        fs = synthetic_frameset(sigma=0.03, sigmat=0.02)
        edges = frameset.knn_pose_graph(fs.gt_poses, 2)
        # perfect correspondences: identical clouds -> index i <-> i
        E, N = edges.shape[0], fs.num_points
        src_fixed = fs.fixed[edges[:, 0]]
        corr = correspond.Correspondences(
            nn_idx=jnp.tile(jnp.arange(N, dtype=jnp.int32), (E, 1)),
            dist=jnp.zeros((E, N), fs.points.dtype),
            valid=jnp.tile(~src_fixed[:, None], (1, N)),
            weight=jnp.ones((E,), fs.points.dtype),
        )
        fs2, stats = mv.solve_multiview(fs, edges, corr,
                                        param_name=param_name,
                                        metric="point_to_point",
                                        robust=False)
        dt, dr = se3.pose_diff(fs2.poses, fs2.gt_poses)
        assert float(jnp.max(dt)) < 1e-8, np.asarray(dt)
        assert float(jnp.max(dr)) < 1e-4
        # gauge: frame 0 untouched bitwise
        np.testing.assert_array_equal(np.asarray(fs2.poses[0]),
                                      np.asarray(fs.poses[0]))


class TestICPLoop:
    def test_fake_fixture_converges(self):
        """The FLAGS_fake system test: identical clouds, noised poses ->
        the full ICP loop re-converges to GT."""
        fs = synthetic_frameset(F=4, N=300, sigma=0.04, sigmat=0.02)
        rmse0 = metrics.alignment_rmse(fs)
        cfg = pipeline.ICPConfig(rounds=8, knn=2, cutoff=1.0,
                                 metric="point_to_point", robust=False,
                                 nn_chunk=512)
        fs2, hist = pipeline.run_icp(fs, cfg)
        rmse1 = metrics.alignment_rmse(fs2)
        assert rmse1 < rmse0 * 1e-3, (rmse0, rmse1)
        dt, dr = se3.pose_diff(fs2.poses, fs2.gt_poses)
        assert float(jnp.max(dt)) < 1e-5

    def test_p2pl_robust_converges(self):
        fs = synthetic_frameset(F=4, N=300, sigma=0.03, sigmat=0.02, seed=7)
        cfg = pipeline.ICPConfig(rounds=8, knn=2, cutoff=1.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=512)
        fs2, _ = pipeline.run_icp(fs, cfg)
        rmse1 = metrics.alignment_rmse(fs2)
        assert rmse1 < 1e-4, rmse1

    def test_fused_equals_host_loop(self):
        fs = synthetic_frameset(F=3, N=200, sigma=0.02, sigmat=0.01, seed=9)
        cfg = pipeline.ICPConfig(rounds=3, knn=2, cutoff=1.0,
                                 metric="point_to_point", robust=False,
                                 nn_chunk=256)
        fs_host, _ = pipeline.run_icp(fs, cfg)
        fs_fused, costs, _ = pipeline.run_icp_fused(fs, cfg)
        np.testing.assert_allclose(np.asarray(fs_host.poses),
                                   np.asarray(fs_fused.poses), atol=1e-10)
        assert costs.shape == (3,)


@needs_samples
class TestBunnySubset:
    def test_bunny_multiview_improves(self):
        """4 real Bunny frames (subsampled): ICP reduces alignment RMSE
        from the injected noise level."""
        raw = datasets.load_raw_frames(datasets.BUNNY_DIR, limit=4, step=2,
                                       sigma=0.02, sigmat=0.01, seed=0)
        fs = frameset.from_raw(raw, dtype=jnp.float64, point_stride=8)
        rmse0 = metrics.alignment_rmse(fs)
        cfg = pipeline.ICPConfig(rounds=5, knn=2, cutoff=0.05,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=512)
        fs2, hist = pipeline.run_icp(fs, cfg)
        rmse1 = metrics.alignment_rmse(fs2)
        assert rmse1 < rmse0 * 0.35, (rmse0, rmse1)


@needs_samples
class TestNoCreep:
    """Regression guards for point-to-plane alternation creep.

    At FULL resolution with the Bunny's shipped *file* normals, the
    correspondence<->solve alternation started AT ground truth walks away
    without bound (~0.001 RMSE/round, 0 -> 0.041 over 40 rounds); with
    PCA-recomputed normals (the reference's FLAGS_recomputeNormals=true
    default, main_multiview.cpp:47,68-70) it locks at the dataset floor
    (<= 0.0031). See BENCHMARKS.md. The full-res run is too heavy for the
    CPU suite, so this guards the two load-bearing pieces: the default
    actually recomputes normals, and a subsampled GT start SATURATES
    (bounded drift) instead of walking linearly."""

    def test_default_recomputes_normals(self):
        raw = datasets.load_raw_frames(datasets.BUNNY_DIR, limit=2, step=2,
                                       sigma=0.0, sigmat=0.0, seed=0)
        fs_def = frameset.from_raw(raw, dtype=jnp.float64, point_stride=8)
        fs_file = frameset.from_raw(raw, dtype=jnp.float64, point_stride=8,
                                    recompute_normals=False)
        dn = jnp.abs(fs_def.normals - fs_file.normals).max()
        assert float(dn) > 0.1  # PCA normals, not the biased file normals
        norms = jnp.linalg.norm(fs_def.normals, axis=-1)[fs_def.valid]
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-6)

    def test_gt_start_saturates(self):
        raw = datasets.load_raw_frames(datasets.BUNNY_DIR, limit=4, step=2,
                                       sigma=0.0, sigmat=0.0, seed=0)
        fs = frameset.from_raw(raw, dtype=jnp.float64, point_stride=8)
        cfg = pipeline.ICPConfig(rounds=8, knn=2, cutoff=0.05,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=1024)
        traj = [float(metrics.alignment_rmse(fs))]
        fs2, _ = pipeline.run_icp(
            fs, cfg, callback=lambda i, f, c, s: traj.append(
                float(metrics.alignment_rmse(f))))
        # subsampling moves the p2pl optimum ~0.0012 from the file GT;
        # the alternation must settle there, not keep walking
        assert traj[-1] < 0.004, traj
        assert abs(traj[-1] - traj[4]) < 3e-4, traj


@needs_samples
class TestDinosaur:
    def test_relocalized_dinosaur_improves(self):
        """Dinosaur (relocalized, see datasets.load_raw_frames docstring):
        surface-alignment RMSE must drop substantially; pose-vs-file-GT is
        not the energy optimum on this ~14%-overlap 2.5D data."""
        raw = datasets.load_raw_frames(datasets.DINOSAUR_DIR, limit=5,
                                       step=1, relocalize_with_gt=True)
        fs = frameset.from_raw(raw, dtype=jnp.float64, point_stride=8,
                               recompute_normals=True)
        rmse0 = metrics.alignment_rmse(fs)
        cfg = pipeline.ICPConfig(rounds=8, knn=2, cutoff=10.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=1024)
        fs2, _ = pipeline.run_icp(fs, cfg)
        rmse1 = metrics.alignment_rmse(fs2)
        assert rmse1 < rmse0 * 0.75, (rmse0, rmse1)

    def test_relocalize_makes_gt_register(self):
        """After relocalization, GT poses align consecutive scans (the
        overlap region) to ~point-spacing distances."""
        from mv_lm_icp_tpu.ops import nn, se3 as se3_ops

        raw = datasets.load_raw_frames(datasets.DINOSAUR_DIR, limit=2,
                                       step=1, relocalize_with_gt=True)
        ga = se3_ops.apply(jnp.asarray(raw.gt_poses[0]),
                           jnp.asarray(raw.points[0][::8]))
        gb = se3_ops.apply(jnp.asarray(raw.gt_poses[1]),
                           jnp.asarray(raw.points[1][::8]))
        _, d2 = nn.nn_1(ga, gb, jnp.ones(gb.shape[0], bool), chunk=512)
        frac_close = float(jnp.mean(jnp.sqrt(d2) < 5.0))
        assert frac_close > 0.5, frac_close


class TestDivergenceWatch:
    """Headless divergence detection (VERDICT r2 #8): the known failure
    mode is low-overlap creep (step=8 Bunny, BENCHMARKS.md) where RMSE
    rises round over round; the watch must warn and suggest --prune."""

    def test_warns_on_monotone_rise(self):
        import warnings

        from mv_lm_icp_tpu.utils import metrics

        w = metrics.DivergenceWatch(patience=3)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            fired = [w.update(v) for v in [0.010, 0.012, 0.014, 0.016]]
        assert fired == [False, False, False, True]
        assert len(rec) == 1 and "--prune" in str(rec[0].message)

    def test_silent_on_convergence(self):
        import warnings

        from mv_lm_icp_tpu.utils import metrics

        w = metrics.DivergenceWatch(patience=3)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            for v in [0.02, 0.015, 0.016, 0.014, 0.013, 0.012]:
                w.update(v)
        assert not rec

    def test_no_prune_hint_when_prune_on(self):
        import warnings

        from mv_lm_icp_tpu.utils import metrics

        w = metrics.DivergenceWatch(patience=2)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            for v in [1.0, 2.0, 3.0]:
                w.update(v, prune_on=True)
        assert len(rec) == 1 and "--prune" not in str(rec[0].message)

    def test_fires_once(self):
        from mv_lm_icp_tpu.utils import metrics

        w = metrics.DivergenceWatch(patience=2)
        import warnings

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            for v in [1.0, 2.0, 3.0, 4.0, 5.0]:
                w.update(v)
        assert len(rec) == 1


class TestFixedSrcEdges:
    """Gauge-anchoring edges (fixed_src_edges): the reference drops every
    correspondence whose source frame is fixed (frame.cpp:93); keeping
    them adds real constraints through frame 0's viewpoint while the
    gauge stays exactly pinned."""

    def test_fixed_src_edges_produce_matches(self):
        fs = synthetic_frameset(F=4, N=256, sigma=0.02, sigmat=0.01,
                                seed=11)
        edges = frameset.knn_pose_graph(fs.poses, 2)
        src_fixed = np.asarray(fs.fixed)[np.asarray(edges)[:, 0]]
        assert src_fixed.any()
        c_off = correspond.find_correspondences(fs, edges, 1.0, chunk=128)
        c_on = correspond.find_correspondences(fs, edges, 1.0, chunk=128,
                                               fixed_src_edges=True)
        per_edge_off = np.asarray(jnp.sum(c_off.valid, axis=1))
        per_edge_on = np.asarray(jnp.sum(c_on.valid, axis=1))
        assert (per_edge_off[src_fixed] == 0).all()
        assert (per_edge_on[src_fixed] > 0).all()
        # non-fixed edges identical
        np.testing.assert_array_equal(per_edge_off[~src_fixed],
                                      per_edge_on[~src_fixed])

    def test_gauge_still_pinned_and_converges(self):
        from mv_lm_icp_tpu.utils import metrics

        fs = synthetic_frameset(F=4, N=256, sigma=0.04, sigmat=0.02,
                                seed=12)
        pose0 = np.asarray(fs.poses[0]).copy()
        cfg = pipeline.ICPConfig(rounds=6, knn=2, cutoff=1.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=128, fixed_src_edges=True)
        rmse0 = metrics.alignment_rmse(fs)
        fs2, _ = pipeline.run_icp(fs, cfg)
        np.testing.assert_array_equal(np.asarray(fs2.poses[0]), pose0)
        assert metrics.alignment_rmse(fs2) < rmse0 * 1e-2


class TestGaugeAlignedRMSE:
    """gauge_aligned_rmse must strip a pure global gauge error: poses
    G o gt have raw RMSE >> 0 but aligned RMSE ~ 0 (the dinosaur
    forensics metric, BENCHMARKS.md round 3)."""

    def test_pure_gauge_error_scores_zero(self):
        from mv_lm_icp_tpu.ops import se3 as se3_ops
        from mv_lm_icp_tpu.utils import metrics

        fs = synthetic_frameset(F=4, N=256, sigma=0.0, sigmat=0.0, seed=13)
        fs = fs.replace(poses=fs.gt_poses)
        G = se3_ops.exp(jnp.asarray([0.05, -0.03, 0.08, 0.2, -0.1, 0.3],
                                    fs.poses.dtype))
        bad = jax.vmap(lambda p: se3_ops.compose(G, p))(fs.gt_poses)
        fs_bad = fs.replace(poses=bad)
        raw = metrics.alignment_rmse(fs_bad)
        aligned = metrics.gauge_aligned_rmse(fs_bad, stride=2)
        assert raw > 0.05
        assert aligned < 1e-5, (raw, aligned)

    def test_real_misregistration_still_scores(self):
        from mv_lm_icp_tpu.utils import metrics

        fs = synthetic_frameset(F=4, N=256, sigma=0.05, sigmat=0.03,
                                seed=14)
        aligned = metrics.gauge_aligned_rmse(fs, stride=2)
        assert aligned > 0.01
