"""Distributed four-step NTT vs the single-chip transform (8-dev mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops import ntt as ntt_ops
from icicle_snark_tpu.parallel.mesh import make_mesh
from icicle_snark_tpu.parallel.ntt_dist import make_dist_ntt
from icicle_snark_tpu.refmath.field import R_MOD, fr_to_mont

LOG_N = 7  # n1=8, n2=16 over 8 devices
B = 2


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(42)
    vals = [[rng.randint(0, 2**62) % R_MOD for _ in range(1 << LOG_N)] for _ in range(B)]
    arrs = [lb.ints_to_limbs_np([fr_to_mont(v) for v in row]) for row in vals]
    x = jnp.asarray(np.stack(arrs, axis=1))  # (16, B, n)
    return x


@pytest.mark.parametrize("inverse", [False, True])
def test_dist_ntt_matches_single_chip(data, inverse):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(jax.devices()[:8])
    dom = ntt_ops.get_domain(LOG_N)

    want = ntt_ops.ntt_natural(data, dom, inverse=inverse)
    fn = make_dist_ntt(mesh, LOG_N, B, inverse=inverse)
    got = fn(data)
    assert np.array_equal(np.asarray(got), np.asarray(want))
