"""Multi-host execution: jax.distributed bootstrap + global-mesh helpers.

The reference is single-process (SURVEY §2.3); this module is the
multi-host leg of the new architecture. The same `sharded_icp_round`
program runs unchanged across hosts: each process initializes
jax.distributed, the (edge, point) mesh spans every process's devices,
FrameSet inputs are replicated globally, the edge list is sharded across
the global edge axis, and the blocked normal equations psum over
ICI-within-host and DCN-across-hosts.

Launch pattern (per host):

    python -m mv_lm_icp_tpu.cli.multiview --sharded \
        --coordinator host0:8476 --num-processes 2 --process-id $RANK ...

or programmatically via :func:`initialize`. A two-process CPU
demonstration (4 virtual devices per process -> one 8-device global mesh)
is exercised by tests/test_multihost.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from . import mesh as mesh_mod


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Bring up jax.distributed (no-op when already initialized or when
    no coordinator is configured)."""
    if coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(shape: Optional[tuple] = None):
    """(edge, point) mesh over every device of every process."""
    return mesh_mod.make_mesh(jax.devices(), shape=shape)


def replicate(tree, mesh):
    """Place host-identical pytree data as globally-replicated arrays.

    Every process must pass the same values (the usual multi-controller
    contract for replicated inputs).
    """
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def shard_edges(edges, mesh):
    """Distribute the (padded) edge list across the global edge axis."""
    from .sharded import pad_edges

    edges = np.asarray(pad_edges(np.asarray(edges),
                                 mesh.shape[mesh_mod.EDGE_AXIS]))
    sharding = NamedSharding(mesh, P(mesh_mod.EDGE_AXIS))
    return jax.make_array_from_callback(
        edges.shape, sharding, lambda idx: edges[idx])


def shard_frames(fs, mesh, axis: str = "frames"):
    """Place a FrameSet for the ring path on a 1-axis global mesh:
    clouds (points/normals/valid) sharded along the frame axis — each
    process materializes only its own frame shards — poses and metadata
    replicated. Every process passes the same host values."""
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return fs.replace(
        points=put(fs.points, shard), normals=put(fs.normals, shard),
        valid=put(fs.valid, shard), poses=put(fs.poses, rep),
        gt_poses=put(fs.gt_poses, rep), fixed=put(fs.fixed, rep))


def fetch_replicated(x):
    """Local value of a replicated global array."""
    return np.asarray(x.addressable_shards[0].data)
