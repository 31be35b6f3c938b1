"""The large-synthetic-scene configuration (BASELINE configs[4]):
scene.xyz cut into overlapping slab frames, solved sharded."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mv_lm_icp_tpu.models import frameset, pipeline
from mv_lm_icp_tpu.parallel import mesh as mesh_mod
from mv_lm_icp_tpu.parallel import sharded
from mv_lm_icp_tpu.utils import datasets, metrics

HAVE_SAMPLES = os.path.exists(datasets.SCENE_XYZ)
needs_samples = pytest.mark.skipif(not HAVE_SAMPLES,
                                   reason="scene.xyz not mounted")


@needs_samples
class TestSceneFrames:
    def test_generation(self):
        raw = datasets.make_scene_frames(num_frames=4, overlap=0.5, seed=1)
        assert len(raw.points) == 4
        # frame 0 estimate exact, others noised
        np.testing.assert_allclose(raw.poses[0], raw.gt_poses[0])
        assert not np.allclose(raw.poses[2], raw.gt_poses[2])
        # overlapping slabs: consecutive frames share geometry in global
        # coords under GT poses
        from mv_lm_icp_tpu.ops import se3

        g0 = np.asarray(se3.apply(jnp.asarray(raw.gt_poses[0]),
                                  jnp.asarray(raw.points[0])))
        g1 = np.asarray(se3.apply(jnp.asarray(raw.gt_poses[1]),
                                  jnp.asarray(raw.points[1])))
        d = np.linalg.norm(g0[:, None, :] - g1[None, :, :], axis=-1).min(1)
        assert (d < 1e-9).mean() > 0.3  # >30% of slab 0 also in slab 1

    def test_sharded_scene_converges(self):
        """Noise at/below the cloud's ~4.5e-3 point spacing; the ICP floor
        on this sparse 5.4k-point scene is boundary-limited, so expect a
        solid improvement rather than exact recovery."""
        raw = datasets.make_scene_frames(num_frames=4, overlap=0.5,
                                         sigma=0.02, sigmat=0.002, seed=2)
        # scene.xyz ships analytic normals; PCA-recomputing them on a
        # sparse 1.3k-point slab (k=10 reaches far past the local surface)
        # degrades them, so keep the fixture's own normals here.
        fs = frameset.from_raw(raw, dtype=jnp.float64, pad_multiple=128,
                               recompute_normals=False)
        rmse0 = metrics.alignment_rmse(fs)
        cfg = pipeline.ICPConfig(rounds=8, knn=2, cutoff=0.01,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=512)
        m = mesh_mod.make_mesh(shape=(4, 2))
        fs2 = sharded.run_icp_sharded(fs, cfg, m, rounds=cfg.rounds)
        rmse1 = metrics.alignment_rmse(fs2)
        assert rmse1 < rmse0 * 0.7, (rmse0, rmse1)
        assert rmse1 < 2e-3, rmse1

    def test_replicate_scales(self):
        raw = datasets.make_scene_frames(num_frames=3, replicate=2, seed=3)
        n_total = sum(p.shape[0] for p in raw.points)
        raw1 = datasets.make_scene_frames(num_frames=3, replicate=1, seed=3)
        n1 = sum(p.shape[0] for p in raw1.points)
        assert n_total > 1.8 * n1
