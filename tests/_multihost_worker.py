"""Worker process for the two-process multi-host CPU tests.

Usage: python tests/_multihost_worker.py <process_id> <num_processes>
       <coordinator_port> <devices_per_process> [mode]

Modes (all print the resulting poses as a flat ``POSES ...`` line):

- ``brute``  — 3 sharded ICP rounds, brute-force NN backend, on the
  global (edge, point) mesh (the round-2 test ran 1 round).
- ``window`` — 3 sharded ICP rounds on the sorted-window backend (the
  backend BENCHMARKS claims scales; VERDICT r2 #6).
- ``ring``   — 2 frame-sharded ring-halo rounds across the processes:
  each process materializes only its own cloud shards, halo frames cross
  the process boundary through ppermute (DCN analogue on CPU).
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    ndev = int(sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "brute"

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
    from mv_lm_icp_tpu.parallel import multihost, ring, sharded
    from tests.test_multiview import synthetic_frameset

    assert len(jax.devices()) == nproc * ndev, jax.devices()

    if mode == "ring":
        fs = synthetic_frameset(F=2 * nproc * ndev, N=64, sigma=0.03,
                                sigmat=0.02, seed=5)
        cfg = pipeline.ICPConfig(rounds=2, knn=2, cutoff=1.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=64)
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()), (ring.AXIS,))
        fs_g = multihost.shard_frames(fs, mesh, axis=ring.AXIS)
        for _ in range(cfg.rounds):
            fs_g, _ = ring.ring_icp_round(fs_g, cfg, mesh)
        poses = multihost.fetch_replicated(fs_g.poses)
    else:
        fs = synthetic_frameset(F=4, N=128, sigma=0.03, sigmat=0.02,
                                seed=3)
        use_window = mode == "window"
        cfg = pipeline.ICPConfig(rounds=3, knn=2, cutoff=1.0,
                                 metric="point_to_plane", robust=True,
                                 nn_chunk=64, use_window=use_window,
                                 window=128)
        edges_local = frameset.knn_pose_graph(fs.poses, cfg.knn)

        mesh = multihost.global_mesh()
        fs_g = multihost.replicate(fs, mesh)
        edges_g = multihost.shard_edges(edges_local, mesh)
        for _ in range(cfg.rounds):
            fs_g, unc = sharded.sharded_icp_round(fs_g, edges_g, cfg, mesh)
            assert int(unc) == 0, f"window coverage lost: {int(unc)}"
        poses = multihost.fetch_replicated(fs_g.poses)
    print("POSES", " ".join(f"{v:.12e}" for v in np.ravel(poses)))


if __name__ == "__main__":
    main()
