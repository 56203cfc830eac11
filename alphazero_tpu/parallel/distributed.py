"""Multi-host (pod-slice) scaling utilities — BASELINE config 5.

The reference is single-process by design (README.md:112-115 rejects
multiprocessing after measuring ~2x from 6 processes); scaling here is SPMD
over a device mesh instead:

- every host runs the same program (`jax.distributed.initialize` wires the
  processes into one JAX runtime),
- self-play envs and MCTS trees shard over the global 'env' axis — each
  host's devices step their local shard, collectives ride ICI within a host
  and DCN across hosts only where GSPMD places them,
- the learner is data-parallel over the same mesh: gradients psum via the
  sharded train step (parallel/mesh.py), parameters stay replicated,
- host-local self-play examples become global sharded arrays with
  `host_local_to_global` (no host ever materializes the full batch), and
  checkpoint writes happen on process 0 after `sync_hosts`.

Single-process usage is a no-op throughout, so the same code path runs on
one chip, one host, or a pod slice.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Wire this process into a multi-host JAX runtime.

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables (and to TPU pod auto-detection when
    none are set).  Returns True if a multi-process runtime was initialized,
    False for the single-process fallback."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # Bare TPU pods auto-detect; anywhere else stay single-process.
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()
            return jax.process_count() > 1
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    log.info("distributed: process %d/%d, %d local + %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return jax.process_count() > 1


def make_pod_mesh(axis: str = "env") -> Mesh:
    """Flat 1-D mesh over ALL global devices.

    Device order groups each host's devices contiguously, so a sharded 'env'
    batch keeps every host's shard on its own ICI domain and GSPMD only
    crosses DCN for the gradient psum / parameter broadcast."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def make_2d_mesh(host_axis: str = "host", env_axis: str = "env") -> Mesh:
    """(host, env) mesh: axis 0 spans DCN, axis 1 the per-host ICI domain.
    Use when a computation wants explicit host-level collectives (e.g.
    reduce_scatter over ICI then psum over DCN)."""
    n_host = jax.process_count()
    n_local = jax.local_device_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape(n_host, n_local)
    return Mesh(arr, (host_axis, env_axis))


def host_local_to_global(mesh: Mesh, local_batch, axis: str = "env"):
    """Per-host numpy/DeviceArray batches -> one global array sharded over
    ``axis``.  Every process passes its own shard (equal sizes); no host
    materializes the global batch."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch)


def global_to_host_local(tree):
    """Fetch this process's addressable shards back to host numpy, stacked
    in device order (inverse of host_local_to_global for even shardings)."""
    def pull(x):
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return jax.tree_util.tree_map(pull, tree)


def replicate_from_host0(tree):
    """Broadcast process 0's pytree to all processes (e.g. initial params or
    a restored checkpoint) — single-process: identity."""
    if jax.process_count() == 1:
        return tree
    return multihost_utils.broadcast_one_to_all(tree)


def sync_hosts(name: str = "sync"):
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)


def is_primary() -> bool:
    return jax.process_index() == 0
