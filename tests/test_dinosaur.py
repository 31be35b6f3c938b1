"""Dinosaur accuracy forensics, pinned in CI (VERDICT r3 #5).

The round-3 investigation (BENCHMARKS.md 'Round-3 forensics') resolved
the dinosaur oracle gap by measurement: under the one shared energy the
framework converges to a LOWER cost than the independent scipy oracle
(whose early-stopped TRF point is not a fixed point), and on the
gauge-aligned metric (registration quality net of the pinned noisy
anchor) the framework beats the oracle ~2.3x. These tests pin both
claims against regression using the committed oracle-pose fixture
(tests/data/dino_oracle_poses.npz, generated once by
benchmarks/make_dino_fixture.py — no 2000 s scipy run in CI).

Workload: the reference's dinosaur sample (5 frames, SfM camera files;
samples/dinosaur) relocalized per utils/datasets.load_raw_frames,
cutoff=10 (the round-2/3 evaluation config), point stride 2 for CI
speed (measured: stride 2 converges to gauge-aligned 0.549 in ~50 s vs
0.542 at stride 1; stride 4 decimates this low-overlap scene past
registrability, plateauing at ~1.56).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "data", "dino_oracle_poses.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="oracle fixture missing — run benchmarks/make_dino_fixture.py")

STRIDE = 2
CUTOFF = 10.0


def _load_fs():
    from mv_lm_icp_tpu.models import frameset
    from mv_lm_icp_tpu.utils import datasets

    raw = datasets.load_raw_frames(datasets.DINOSAUR_DIR, limit=5, step=1,
                                   relocalize_with_gt=True)
    return frameset.from_raw(raw, dtype=jnp.float32, point_stride=STRIDE,
                             recompute_normals=True)


def _cfg():
    from mv_lm_icp_tpu.models import pipeline

    # the round-3 winning configuration: gauge-anchoring correspondences
    # + median outlier rejection + the scale-normalized loss (energy
    # parity with the oracle's TRF formulation, ops/robust.soft_l1_norm)
    return pipeline.ICPConfig(
        rounds=12, knn=2, cutoff=CUTOFF, metric="point_to_plane",
        robust=True, loss="soft_l1_norm", prune=True,
        fixed_src_edges=True, nn_chunk=2048)


def _energy(fs, poses, edges, cfg):
    """The alternation's self-consistent energy at a pose set: search
    correspondences AT those poses (same policy for every candidate),
    then evaluate the joint robust cost there."""
    from mv_lm_icp_tpu.models import correspond
    from mv_lm_icp_tpu.ops import residuals as res_mod
    from mv_lm_icp_tpu.solvers import multiview as mv

    import jax

    fs = fs.replace(poses=jnp.asarray(poses, fs.poses.dtype))
    corr = correspond.find_correspondences(
        fs, edges, cfg.cutoff, chunk=cfg.nn_chunk, prune=cfg.prune,
        fixed_src_edges=cfg.fixed_src_edges)
    param = res_mod.PARAMS[cfg.param_name]
    system = mv.make_multiview_system(param, cfg.metric, fs, edges, corr,
                                      robust=cfg.robust, loss=cfg.loss)
    xs = jax.vmap(param.from_pose7)(fs.poses)
    cost, _, _ = system(xs)
    return float(cost)


class TestDinosaurForensics:
    @pytest.fixture(scope="class")
    def converged(self):
        from mv_lm_icp_tpu.models import frameset, pipeline

        fs = _load_fs()
        cfg = _cfg()
        edges = frameset.knn_pose_graph(fs.poses, cfg.knn)
        fs_out, _ = pipeline.run_icp(fs, cfg)
        return fs, fs_out, edges, cfg

    def test_energy_beats_oracle(self, converged):
        """Our converged poses reach an energy <= the oracle's stored
        poses under the one shared energy (BENCHMARKS.md forensics #3:
        4579.9 vs 4732.1 at stride 1 — the oracle's early-stopped TRF
        point is not stationary)."""
        fs, fs_out, edges, cfg = converged
        oracle_poses = np.load(FIXTURE)["poses"]
        e_ours = _energy(fs, fs_out.poses, edges, cfg)
        e_oracle = _energy(fs, oracle_poses, edges, cfg)
        assert np.isfinite(e_ours) and np.isfinite(e_oracle)
        assert e_ours <= e_oracle * 1.001, (e_ours, e_oracle)

    def test_gauge_aligned_rmse(self, converged):
        """Registration quality net of the pinned noisy anchor: the
        gauge-aligned RMSE must stay in the round-3 class (0.58 at
        stride 1 with anchor+prune; <= 0.7 bound per VERDICT r3 #5) and
        beat the oracle's stored poses on the same metric."""
        from mv_lm_icp_tpu.utils import metrics

        fs, fs_out, edges, cfg = converged
        aligned = metrics.gauge_aligned_rmse(fs_out)
        assert aligned <= 0.7, aligned
        oracle_poses = np.load(FIXTURE)["poses"]
        fs_oracle = fs.replace(
            poses=jnp.asarray(oracle_poses, fs.poses.dtype))
        aligned_oracle = metrics.gauge_aligned_rmse(fs_oracle)
        assert aligned < aligned_oracle, (aligned, aligned_oracle)
