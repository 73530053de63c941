"""Device-mesh plumbing for multi-chip and multi-host proving.

The reference has NO cross-device communication at all — its multi-GPU
story is one independent device per host thread
(/root/reference/icicle/src/device_api.cpp:199-228). Scaling one proof
across chips is therefore a new, TPU-native subsystem: a 1-D `data`
mesh over ICI (and DCN across hosts), `shard_map`ped kernels, and XLA
collectives (`psum` for the R1CS accumulation, `all_gather` for MSM
window partials, `all_to_all` for the distributed NTT transpose).

Multi-host: call `init_distributed()` once per process (or set the
standard JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
env triplet and it is picked up automatically); `make_mesh()` then
builds the mesh over the GLOBAL device list, hosts-major, so the
contiguous shards of each array land on each host's local chips and
the per-window all_gather/psum collectives ride ICI within a host and
DCN across hosts. The prove-side code is mesh-size agnostic — the same
shard_map programs run at any D.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "data"

_DIST_INITIALIZED = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the JAX distributed runtime for a multi-host mesh
    (the DCN scale-out path; the reference has no analog — SURVEY §2.7).

    Returns True when running multi-process. Safe to call repeatedly
    and in single-host setups (no-op without a coordinator)."""
    global _DIST_INITIALIZED
    if _DIST_INITIALIZED:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None,
        process_id=process_id if process_id is not None else (
            int(os.environ["JAX_PROCESS_ID"]) if "JAX_PROCESS_ID" in os.environ else None
        ),
    )
    _DIST_INITIALIZED = True
    return jax.process_count() > 1


def make_mesh(devices=None) -> Mesh:
    """1-D `data` mesh. Default: ALL global devices (multi-host when
    init_distributed ran), ordered hosts-major so contiguous array
    shards are host-local and cross-host traffic is collective-only."""
    if devices is None:
        init_distributed()
        devices = sorted(
            jax.devices(), key=lambda d: (d.process_index, d.id)
        )
    return Mesh(np.asarray(devices), (AXIS,))


def host_local_to_global(mesh: Mesh, pspec: P, local_arr):
    """Assemble a GLOBAL sharded array from this process's local chunk
    (multi-host ingest: each host mmaps the same zkey and keeps only
    its contiguous slice of every sharded-axis array). Single-process:
    returns the array unchanged (jit places it)."""
    if jax.process_count() == 1:
        return local_arr
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, pspec), np.asarray(local_arr)
    )


def globalize(mesh: Mesh, pspec: P, arr):
    """FULL host/device array -> global sharded array, multi-process
    safe. Single-process: passthrough (jit places it). Multi-process:
    slice this process's contiguous span along the sharded axis (the
    mesh is hosts-major, so spans are contiguous) and assemble via
    host_local_to_global. Callers that already hold only their local
    slice (the mmap-ingest path) should call host_local_to_global
    directly instead."""
    if jax.process_count() == 1:
        return arr
    axes = [i for i, s in enumerate(tuple(pspec)) if s is not None]
    if not axes:
        return host_local_to_global(mesh, pspec, arr)
    (axis,) = axes  # 1-D data mesh: at most one sharded dim
    full = np.asarray(arr)
    nproc = jax.process_count()
    pid = jax.process_index()
    n = full.shape[axis]
    assert n % nproc == 0, f"axis {axis} ({n}) not divisible by {nproc} processes"
    span = n // nproc
    sl = [slice(None)] * full.ndim
    sl[axis] = slice(pid * span, (pid + 1) * span)
    return host_local_to_global(mesh, pspec, full[tuple(sl)])


def shard_last(mesh: Mesh) -> NamedSharding:
    """Shard the trailing (batch/point) axis; limb axes replicated."""
    return NamedSharding(mesh, P(*([None]), AXIS))


def pspec_last(ndim: int) -> P:
    return P(*([None] * (ndim - 1) + [AXIS]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
