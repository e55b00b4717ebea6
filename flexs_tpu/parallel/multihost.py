"""Multi-host (DCN) sharding for the sweep engine.

SURVEY.md §2.5 requires sweep sharding "across slices over DCN".  The sweep
workload is embarrassingly parallel at the cell level (each cell is an
independent experiment), so the multi-host design is: a 2-D device mesh
with a `hosts` axis that follows process (slice) boundaries and a `cells`
axis over the devices within each slice, and the flat cell batch sharded
over BOTH axes — `PartitionSpec(("hosts", "cells"))`.  No collective ever
crosses the DCN boundary during the sweep itself; the only cross-host
traffic is the final result gather.

Usage on a multi-slice TPU deployment (one process per slice):

    import jax
    jax.distributed.initialize()          # TPU pods: args auto-detected
    mesh = multihost.multihost_sweep_mesh()
    df = run_landscape_robustness_sweep(..., mesh=mesh)

The same code path is exercised hardware-free by
tests/test_multihost_sweep.py: 2 coordinated CPU processes x 4 virtual
devices each (`jax.distributed.initialize(coordinator, 2, pid)`), asserting
the sharded sweep equals the single-process result cell for cell.
"""
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils, multihost_utils
from jax.sharding import Mesh


def multihost_sweep_mesh(axis_names=("hosts", "cells")) -> Mesh:
    """Build the [hosts, devices-per-host] sweep mesh over all processes.

    The first axis follows process granules (DCN/data-center network on a
    multi-slice TPU deployment), the second the fast interconnect within a
    slice.  With one process this degenerates to a [1, n_devices] mesh that
    behaves exactly like the single-host `Mesh(devices, ("cells",))` the
    sweep engine documents.
    """
    n_proc = jax.process_count()
    per_host = len(jax.devices()) // n_proc
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, per_host),
        dcn_mesh_shape=(n_proc, 1),
        process_is_granule=True,
    )
    return Mesh(devices, axis_names)


def gather_to_host(tree):
    """Fetch a (possibly non-addressable) device pytree as host numpy.

    Single process: a plain device-to-host copy.  Multi-process: a
    `process_allgather`, after which every host holds the full result —
    the one cross-DCN transfer of the whole sweep.
    """
    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    return jax.tree.map(
        lambda x: np.asarray(multihost_utils.process_allgather(x, tiled=True))
        if isinstance(x, jax.Array) and not x.is_fully_addressable
        else np.asarray(x),
        tree,
    )
