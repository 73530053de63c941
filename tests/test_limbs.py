"""Differential tests: JAX limb field arithmetic vs the Python-int oracle."""

import random

import jax
import numpy as np

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.refmath.field import Q, R_MOD

rng = random.Random(42)


def _rand_vals(n, mod):
    vals = [rng.randrange(mod) for _ in range(n - 4)]
    # adversarial edge cases
    vals += [0, 1, mod - 1, (1 << 255) % mod]
    return vals


def _check_binop(jax_fn, py_fn, spec, n=64):
    a_ints = _rand_vals(n, spec.modulus)
    b_ints = _rand_vals(n, spec.modulus)
    a = lb.ints_to_limbs_np(a_ints)
    b = lb.ints_to_limbs_np(b_ints)
    out = jax.jit(lambda x, y: jax_fn(x, y, spec))(a, b)
    got = lb.limbs_to_ints_np(out)
    want = [py_fn(x, y) % spec.modulus for x, y in zip(a_ints, b_ints)]
    assert got == want


def test_limb_roundtrip():
    vals = _rand_vals(32, Q)
    assert lb.limbs_to_ints_np(lb.ints_to_limbs_np(vals)) == vals


def test_u32_word_roundtrip():
    vals = _rand_vals(16, Q)
    words = np.array([[(v >> (32 * i)) & 0xFFFFFFFF for i in range(8)] for v in vals], dtype=np.uint32)
    limbs = lb.u32x8_to_limbs(words)
    assert lb.limbs_to_ints_np(limbs) == vals
    back = lb.limbs_to_u32x8(limbs)
    assert np.array_equal(back, words)


def test_add_mod():
    for spec in (lb.FQ_SPEC, lb.FR_SPEC):
        _check_binop(lb.add_mod, lambda x, y: x + y, spec)


def test_sub_mod():
    for spec in (lb.FQ_SPEC, lb.FR_SPEC):
        _check_binop(lb.sub_mod, lambda x, y: x - y, spec)


def test_mont_mul():
    for spec in (lb.FQ_SPEC, lb.FR_SPEC):
        rinv = spec.rinv
        _check_binop(lb.mont_mul, lambda x, y: x * y * rinv, spec)


def test_mont_reduce_and_to_mont():
    spec = lb.FR_SPEC
    vals = _rand_vals(32, R_MOD)
    a = lb.ints_to_limbs_np(vals)
    red = lb.limbs_to_ints_np(jax.jit(lambda x: lb.mont_reduce(x, spec))(a))
    assert red == [v * spec.rinv % R_MOD for v in vals]
    up = lb.limbs_to_ints_np(jax.jit(lambda x: lb.to_mont(x, spec))(a))
    assert up == [v * spec.r_mod % R_MOD for v in vals]
    # round trip
    down = lb.limbs_to_ints_np(lb.mont_reduce(lb.to_mont(a, spec), spec))
    assert down == vals


def test_neg_and_zero():
    spec = lb.FQ_SPEC
    vals = [0, 1, Q - 1, 12345]
    a = lb.ints_to_limbs_np(vals)
    neg = lb.limbs_to_ints_np(lb.neg_mod(a, spec))
    assert neg == [(-v) % Q for v in vals]
    z = np.asarray(lb.is_zero(a))
    assert z.tolist() == [True, False, False, False]


def test_mont_mul_associativity_random_batch():
    spec = lb.FR_SPEC
    n = 256
    a = lb.ints_to_limbs_np(_rand_vals(n, R_MOD))
    b = lb.ints_to_limbs_np(_rand_vals(n, R_MOD))
    c = lb.ints_to_limbs_np(_rand_vals(n, R_MOD))
    f = jax.jit(lambda x, y: lb.mont_mul(x, y, spec))
    lhs = f(f(a, b), c)
    rhs = f(a, f(b, c))
    assert lb.limbs_to_ints_np(lhs) == lb.limbs_to_ints_np(rhs)
