"""Data-parallel MSM over a device mesh.

The TPU answer to the reference's single-GPU chunked MSM
(/root/reference/icicle/backend/cuda/src/msm/cuda_msm.cuh:1240-1395):
instead of double-buffering chunks through one device, shard the
(scalars, points) arrays across the `data` mesh axis, run the local
Pippenger window pipeline per shard, `all_gather` the tiny per-device
window partials (W projective points), and tree-reduce them
deterministically (fixed reduction order -> bit-exact results at any
device count, SURVEY.md section 7 hard part (c)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..curve import jcurve as jc
from ..ops import msm as msm_ops
from .mesh import AXIS


def msm_window_sums_local(scalar_groups, point_groups, ops, c: int, k: int):
    """Local shard-level grouped window sums + cross-device combine.

    Must be called inside shard_map with each group's scalars/points
    holding the local shard. Returns replicated (coords..., G, W)
    window sums.
    """
    wsums = msm_ops.msm_device_grouped(scalar_groups, point_groups, ops, c, k)
    # stacked (3, coords..., G, W) per device -> per-coord (..., W, D)
    gathered = jnp.moveaxis(jax.lax.all_gather(wsums, AXIS), 0, -1)
    # identity-padded pairwise reduce: fixed order -> deterministic
    return jc.point_stack(
        msm_ops._tree_reduce(jc.point_unstack(gathered), ops)
    )
