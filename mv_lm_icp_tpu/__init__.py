"""mv_lm_icp_tpu — a TPU-native multiview LM-ICP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++/Ceres implementation (adrelino/mv-lm-icp): pairwise and multiview rigid
point-cloud registration with point-to-point / point-to-plane metrics, three
rotation parameterizations (angle-axis, unit quaternion, SE(3) Lie algebra),
an on-device Levenberg-Marquardt solver, closed-form pairwise baselines
(Eggert SVD, Low linearization), a GICP-style pose-graph solver, and
brute-force/tiled nearest-neighbour correspondence kernels — all built for
sharded execution over a `jax.sharding.Mesh`.

Layout
------
- ``ops``      : so3/quat/se3 geometry, residual+Jacobian factories,
                 robust losses, PCA normals, NN search (jnp reference).
- ``kernels``  : Pallas TPU kernels (tiled 1-NN, ...).
- ``models``   : the FrameSet scene model, frame graph, correspondence
                 pipeline, ICP drivers.
- ``solvers``  : closed-form, pairwise LM, multiview joint LM, pose-graph.
- ``parallel`` : device meshes, sharded correspondence/assembly, collectives.
- ``utils``    : IO/datasets, config, timers, metrics, checkpointing, export.
- ``cli``      : `pairwise` and `multiview` entry points mirroring the
                 reference's gflags surface.
"""

__version__ = "0.1.0"
