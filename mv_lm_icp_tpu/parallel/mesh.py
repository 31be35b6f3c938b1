"""Device mesh construction for multi-chip / multi-host execution.

The reference is single-threaded and single-process (SURVEY §2.3) — every
parallel axis here is new TPU-first architecture. The mesh has two logical
axes:

- ``edge``:  data parallelism over frame-graph edges (each device owns a
             slice of the correspondence + Hessian-block work). This is the
             scaling axis for frame count.
- ``point``: sequence-parallel analogue — shards the per-edge point axis,
             for clouds too large for one chip's correspondence tile.

Hessian blocks are psum-reduced over both axes; the tiny gauge-fixed
[6F, 6F] solve runs replicated. Cross-host, the same program runs under
``jax.distributed.initialize`` with the mesh spanning all processes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

EDGE_AXIS = "edge"
POINT_AXIS = "point"


def _factor(n: int) -> tuple:
    """Split n into (edge, point) factors, edge-major and as square as
    possible (edge parallelism is cheaper — no per-edge collectives)."""
    best = (n, 1)
    for e in range(n, 0, -1):
        if n % e == 0:
            p = n // e
            if e >= p:
                best = (e, p)
            else:
                break
    return best


def make_mesh(devices: Optional[Sequence] = None,
              shape: Optional[tuple] = None) -> Mesh:
    """Build an (edge, point) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = _factor(n)
    assert shape[0] * shape[1] == n, (shape, n)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (EDGE_AXIS, POINT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def edge_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(EDGE_AXIS))
