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

__version__ = "0.5.0"


def register_pair(*args, **kwargs):
    from . import api

    return api.register_pair(*args, **kwargs)


def register_multiview(*args, **kwargs):
    from . import api

    return api.register_multiview(*args, **kwargs)

import jax as _jax

# On TPU, f32 matmuls/einsums default to a single bf16 MXU pass (~1e-2
# relative error). Registration accuracy is this framework's product —
# pose recovery to ~1e-6 — and the error creeps into every small matrix
# product (3x3 SVD recomposition, so3 exp's W@W, Jacobian chain products),
# so the correct default here is full-precision f32. Perf-critical kernels
# that can tolerate bf16 (e.g. NN candidate shortlists) opt down explicitly
# per-op; the Pallas kernels control their own precision regardless.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: first compiles through this rig's
# remote-compile tunnel take minutes, so cache hits matter more than in a
# typical JAX install. Opt out with MVICP_NO_COMPILE_CACHE=1.
#
# NEVER enabled on the CPU backend: XLA:CPU cache entries are AOT results
# specialized to the *compiling* machine's CPU features, and jax
# deserializes them on a key hit even when the executing host lacks those
# features ("Machine type used for XLA:CPU compilation doesn't match the
# machine type for execution ... could lead to execution errors such as
# SIGILL") — a .jax_cache shared through git then segfaults test runs on
# other hosts (this took down the round-3 full-suite run). CPU compiles
# are fast; only the TPU/remote-compile path needs persistence.
import os as _os


def _configured_platform() -> str:
    """The platform jax will initialize, WITHOUT triggering backend init:
    config first (tests set jax.config jax_platforms='cpu'), then the
    JAX_PLATFORMS env var, else '' (= auto-select)."""
    p = getattr(_jax.config, "jax_platforms", None) \
        or _os.environ.get("JAX_PLATFORMS", "")
    return (p or "").split(",")[0].strip().lower()


def _cache_safe_platform() -> bool:
    """True only when a non-CPU backend is POSITIVELY known. A host with
    nothing configured that would auto-select the CPU backend must not
    enable the shared committed cache (the SIGILL hazard above) — so
    with no explicit platform, consult the already-initialized backend
    if there is one, and otherwise stay off rather than guess."""
    p = _configured_platform()
    if p:
        return p != "cpu"
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            return _jax.default_backend() != "cpu"
    except Exception:
        pass
    return False


if not _os.environ.get("MVICP_NO_COMPILE_CACHE") and _cache_safe_platform():
    _cache_dir = _os.environ.get(
        "MVICP_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      "..", ".jax_cache"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:
        pass
