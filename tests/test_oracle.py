"""Cross-implementation check: the framework's multiview result must
agree with an INDEPENDENT numpy/scipy pipeline (cKDTree NN + scipy TRF
robust least squares, benchmarks/oracle_scipy.py) on the same problem —
the falsifiable replacement for comparing the solver against itself.
"""
import jax.numpy as jnp
import numpy as np

from benchmarks import oracle_scipy as oracle
from mv_lm_icp_tpu.models import pipeline
from mv_lm_icp_tpu.utils import metrics
from tests.test_multiview import synthetic_frameset


def _oracle_inputs(fs):
    frames = []
    F = int(fs.num_frames)
    for f in range(F):
        m = np.asarray(fs.valid[f])
        # scipy (cKDTree/Rotation) requires writable buffers; jax->numpy
        # views are read-only, so copy
        frames.append(dict(pts=np.array(fs.points[f])[m],
                           nor=np.array(fs.normals[f])[m]))
    poses = [oracle.se3param_to_rt(np.array(p)) for p in fs.poses]
    gts = [oracle.se3param_to_rt(np.array(p)) for p in fs.gt_poses]
    return frames, poses, gts


class TestOracleAgreement:
    def test_both_converge_to_same_basin(self):
        fs = synthetic_frameset(F=4, N=400, sigma=0.03, sigmat=0.02,
                                seed=11)
        rmse0 = metrics.alignment_rmse(fs)

        cfg = pipeline.ICPConfig(rounds=8, knn=2, cutoff=1.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=128)
        fs_ours, _ = pipeline.run_icp(fs, cfg)
        rmse_ours = metrics.alignment_rmse(fs_ours)

        frames, poses, gts = _oracle_inputs(fs)
        _, hist = oracle.run(frames, poses, gts, rounds=8, cutoff=1.0,
                             verbose=False)
        rmse_oracle = hist[-1]

        # both implementations must reduce the error by >=100x and land
        # within 3x of each other (different robust-loss scaling makes
        # exact agreement impossible; same basin is the claim)
        assert rmse_ours < rmse0 * 1e-2, (rmse0, rmse_ours)
        assert rmse_oracle < rmse0 * 1e-2, (rmse0, rmse_oracle)
        ratio = max(rmse_ours, rmse_oracle) / max(
            min(rmse_ours, rmse_oracle), 1e-12)
        assert ratio < 3.0 or max(rmse_ours, rmse_oracle) < 1e-4, (
            rmse_ours, rmse_oracle)

    def test_oracle_pose_graph_matches_ours(self):
        fs = synthetic_frameset(F=5, N=64, sigma=0.01, sigmat=0.01,
                                seed=12)
        from mv_lm_icp_tpu.models import frameset

        ours = np.asarray(frameset.knn_pose_graph(fs.poses, 2))
        frames, poses, gts = _oracle_inputs(fs)
        theirs = oracle.knn_pose_graph(poses, 2)
        assert set(map(tuple, ours.tolist())) == set(theirs)
