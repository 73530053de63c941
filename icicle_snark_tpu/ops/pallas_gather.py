"""Pallas DMA row-gather for the MSM per-window point reorder.

The MSM reorders the point payload into bucket order once per window:
a row gather of a (total, R) u32 table by the argsort order (ops/msm.py
_window_sum_grouped). XLA lowers that gather to VPU shuffles measured
at ~11.5 GB/s on v5e (tools/gather_microbench.py) against ~819 GB/s
HBM. This kernel instead issues one async DMA per row (HBM -> VMEM
output block) from a scalar-prefetched index vector, keeping NSEM
copies in flight (the double-buffering pattern from the TPU Pallas
guide, generalized to an NSEM-deep rotation).

The reference's analog is the cub radix-sort pair-permutation feeding
bucket accumulation (/root/reference/icicle/backend/cuda/src/msm/
cuda_msm.cuh:401-487) — a GPU solves this with memory-coalesced
scatter; the TPU-native tool is the DMA engine driven by prefetched
indices.

Caveat measured on v5e: per-row DMA issue runs on the scalar core, so
tiny rows are issue-rate-bound, not bandwidth-bound. Wired into the
MSM reorder behind ISTPU_PALLAS_GATHER=1
(ops/msm.py:_window_bucket_prefixes); the measured A/B on the real
chip is recorded in ROADMAP.md — the XLA packed row gather stays the
default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM = 16  # DMAs kept in flight per block


def _gather_kernel(idx_ref, table_ref, out_ref, sems, *, block_rows: int):
    """Gather block `pl.program_id(0)`: out_ref[r] = table[idx[base+r]].

    idx_ref: scalar-prefetched (m,) int32 in SMEM
    table_ref: (n, R) u32 in HBM (ANY)
    out_ref: (block_rows, R) u32 VMEM block
    sems: (NSEM,) DMA semaphores, one outstanding copy per slot
    """
    base = pl.program_id(0) * block_rows

    def copy(dst_row, src_row, slot):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(src_row, 1)],
            out_ref.at[pl.ds(dst_row, 1)],
            sems.at[slot],
        )

    def body(r, _):
        slot = jax.lax.rem(r, NSEM)

        @pl.when(r >= NSEM)
        def _():
            # wait for the previous copy on this slot (same byte count;
            # the descriptor's indices are irrelevant to the wait)
            copy(0, 0, slot).wait()

        copy(r, idx_ref[base + r], slot).start()
        return _

    jax.lax.fori_loop(0, block_rows, body, None, unroll=8)

    def drain(s, _):
        copy(0, 0, s).wait()
        return _

    jax.lax.fori_loop(0, min(NSEM, block_rows), drain, None)


@partial(jax.jit, static_argnames=("block_rows", "interpret"))
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                block_rows: int = 2048, interpret: bool = False):
    """table (n, R) u32, idx (m,) int32 -> (m, R) u32 == table[idx].

    m is padded up to a block_rows multiple internally (pad rows gather
    row 0 and are sliced off)."""
    m = idx.shape[0]
    n, r_cols = table.shape
    pad = (-m) % block_rows
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
    grid = (m + pad) // block_rows

    out = pl.pallas_call(
        partial(_gather_kernel, block_rows=block_rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (block_rows, r_cols), lambda i, idx_ref: (i, 0)
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((m + pad, r_cols), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, table)
    return out[:m] if pad else out
