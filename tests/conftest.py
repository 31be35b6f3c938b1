"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh/psum/shard_map) are exercised without TPU hardware, and with x64
enabled so the accuracy tests can hit the reference's double-precision
tolerances (BASELINE.md: diff_tra ~1e-11..1e-15).

NOTE: this environment pre-imports jax from sitecustomize with the TPU
backend pinned, so ``JAX_PLATFORMS`` in the environment is ineffective —
the platform must be forced through ``jax.config`` instead, before any
backend is initialized.
"""
import os

# never touch the persistent compile cache from tests: the CPU backend's
# cache entries are machine-specific AOT executables, and deserializing an
# entry written on another host (e.g. the committed .jax_cache from a TPU
# bench rig) SIGILLs the whole pytest process — the round-3 full-suite
# segfault. The package's import-time enablement is already platform-
# gated; this env var makes the suite immune regardless of import order.
os.environ.setdefault("MVICP_NO_COMPILE_CACHE", "1")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
