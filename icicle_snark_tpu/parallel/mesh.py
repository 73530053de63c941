"""Device-mesh plumbing for multi-chip proving.

The reference has NO cross-device communication at all — its multi-GPU
story is one independent device per host thread
(/root/reference/icicle/src/device_api.cpp:199-228). Scaling one proof
across chips is therefore a new, TPU-native subsystem: a 1-D `data`
mesh over ICI, `shard_map`ped kernels, and XLA collectives (`psum` for
the R1CS accumulation, `all_gather` for MSM window partials,
`all_to_all` for the distributed NTT transpose).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def shard_last(mesh: Mesh) -> NamedSharding:
    """Shard the trailing (batch/point) axis; limb axes replicated."""
    return NamedSharding(mesh, P(*([None]), AXIS))


def pspec_last(ndim: int) -> P:
    return P(*([None] * (ndim - 1) + [AXIS]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
