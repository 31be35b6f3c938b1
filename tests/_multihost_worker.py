"""Worker process for the two-process multi-host CPU test.

Usage: python tests/_multihost_worker.py <process_id> <num_processes>
       <coordinator_port> <devices_per_process>

Runs one sharded ICP round on the shared synthetic fixture over the
global (edge, point) mesh and prints the resulting poses as a flat list.
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    ndev = int(sys.argv[4])

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}").strip()
    os.environ["MVICP_NO_COMPILE_CACHE"] = "1"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mv_lm_icp_tpu.models import frameset, pipeline
    from mv_lm_icp_tpu.parallel import multihost, sharded
    from tests.test_multiview import synthetic_frameset

    assert len(jax.devices()) == nproc * ndev, jax.devices()

    fs = synthetic_frameset(F=4, N=128, sigma=0.03, sigmat=0.02, seed=3)
    cfg = pipeline.ICPConfig(rounds=1, knn=2, cutoff=1.0,
                             metric="point_to_plane", robust=True,
                             nn_chunk=64)
    edges_local = frameset.knn_pose_graph(fs.poses, cfg.knn)

    mesh = multihost.global_mesh()
    fs_g = multihost.replicate(fs, mesh)
    edges_g = multihost.shard_edges(edges_local, mesh)
    fs2, _ = sharded.sharded_icp_round(fs_g, edges_g, cfg, mesh)
    poses = multihost.fetch_replicated(fs2.poses)
    print("POSES", " ".join(f"{v:.12e}" for v in np.ravel(poses)))


if __name__ == "__main__":
    main()
