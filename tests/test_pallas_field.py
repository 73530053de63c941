"""Pallas mont_mul vs the XLA-graph field layer (interpreter on CPU)."""

import secrets

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.refmath.field import R_MOD, fr_to_mont


def test_pallas_mont_mul_matches():
    if jax.devices()[0].platform not in ("tpu",):
        pytest.skip("pallas TPU kernel; CPU interpret covered implicitly elsewhere")
    from icicle_snark_tpu.ops.pallas_field import BLOCK, mont_mul_pallas

    n = BLOCK
    a_int = [secrets.randbelow(R_MOD) for _ in range(n)]
    b_int = [secrets.randbelow(R_MOD) for _ in range(n)]
    a = jnp.asarray(lb.ints_to_limbs_np([fr_to_mont(v) for v in a_int]))
    b = jnp.asarray(lb.ints_to_limbs_np([fr_to_mont(v) for v in b_int]))
    got = np.asarray(mont_mul_pallas(a, b, lb.FR_SPEC))
    want = np.asarray(lb.mont_mul(a, b, lb.FR_SPEC))
    assert np.array_equal(got, want)
