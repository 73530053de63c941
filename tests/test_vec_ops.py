"""Vec-ops + inversion vs the Python oracle (differential, tiny sizes)."""

import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops import vec_ops as vo
from icicle_snark_tpu.refmath.field import R_MOD, MONT_R_FR, fr_to_mont, fr_from_mont

N = 16


@pytest.fixture(scope="module")
def vals():
    rng = [secrets.randbelow(R_MOD) for _ in range(2 * N)]
    a_int, b_int = rng[:N], rng[N:]
    a = jnp.asarray(lb.ints_to_limbs_np([fr_to_mont(v) for v in a_int]))
    b = jnp.asarray(lb.ints_to_limbs_np([fr_to_mont(v) for v in b_int]))
    return a_int, b_int, a, b


def from_mont_list(arr):
    return [fr_from_mont(v) for v in lb.limbs_to_ints_np(np.asarray(arr))]


def test_div_inv(vals):
    a_int, b_int, a, b = vals
    got = from_mont_list(vo.div(a, b))
    want = [x * pow(y, -1, R_MOD) % R_MOD for x, y in zip(a_int, b_int)]
    assert got == want


def test_batch_inv(vals):
    a_int, _b, a, _bb = vals
    got = from_mont_list(lb.batch_inv(a, lb.FR_SPEC))
    want = [pow(x, -1, R_MOD) for x in a_int]
    assert got == want


def test_reductions(vals):
    a_int, _b, a, _bb = vals
    s = vo.sum_reduce(a)
    assert fr_from_mont(lb.limbs_to_ints_np(np.asarray(s).reshape(16, 1))[0]) == sum(a_int) % R_MOD
    p = vo.product_reduce(a)
    want = 1
    for x in a_int:
        want = want * x % R_MOD
    assert fr_from_mont(lb.limbs_to_ints_np(np.asarray(p).reshape(16, 1))[0]) == want


def test_scalar_ops(vals):
    a_int, b_int, a, b = vals
    s = a[:, :1]
    got = from_mont_list(vo.scalar_mul(s, b))
    want = [a_int[0] * y % R_MOD for y in b_int]
    assert got == want
