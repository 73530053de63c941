"""Pallas DMA row-gather (ops/pallas_gather.py) vs jnp.take, in
interpreter mode on the CPU mesh (DMA semantics are emulated)."""

import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu.ops.pallas_gather import gather_rows


@pytest.mark.parametrize("m,block", [(256, 64), (300, 128)])
def test_gather_rows_matches_take(m, block):
    rng = np.random.default_rng(7)
    n, r = 512, 32
    table = jnp.asarray(rng.integers(0, 1 << 32, (n, r), dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (m,), dtype=np.int32))
    out = gather_rows(table, idx, block_rows=block, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[np.asarray(idx)])
