"""Unit tests for the pure-Python BN254 oracle (fields, curves, pairing).

Known-answer vectors come from the reference's compile-time parameter
tables (bn254_scalar.h / cache.rs W table) and standard BN254 facts.
"""

import random

from icicle_snark_tpu.refmath import field as f
from icicle_snark_tpu.refmath import tower as tw
from icicle_snark_tpu.refmath import curve as cv
from icicle_snark_tpu.refmath import pairing as pr

rng = random.Random(1234)


def test_root_of_unity_table_matches_reference():
    # /root/reference/src/cache.rs:25-56 hardcodes W[i]; spot-check a few.
    assert f.W[0] == 1
    assert f.W[1] == 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000000
    assert f.W[2] == 0x30644E72E131A029048B6E193FD841045CEA24F6FD736BEC231204708F703636
    assert f.W[28] == 0x2A3C09F0A58A7E8500E0A7EB8EF62ABC402D111E41112ED49BD61B6E725B19F0
    for i in range(1, 29):
        assert pow(f.W[i], 1 << i, f.R_MOD) == 1
        assert pow(f.W[i], 1 << (i - 1), f.R_MOD) != 1


def test_fq2_field_axioms():
    for _ in range(20):
        a = (rng.randrange(f.Q), rng.randrange(f.Q))
        b = (rng.randrange(f.Q), rng.randrange(f.Q))
        assert tw.fq2_mul(a, b) == tw.fq2_mul(b, a)
        assert tw.fq2_mul(a, tw.fq2_inv(a)) == tw.FQ2_ONE
        assert tw.fq2_sqr(a) == tw.fq2_mul(a, a)


def test_fq6_fq12_inverse():
    def rnd2():
        return (rng.randrange(f.Q), rng.randrange(f.Q))

    for _ in range(5):
        a6 = (rnd2(), rnd2(), rnd2())
        assert tw.fq6_mul(a6, tw.fq6_inv(a6)) == tw.FQ6_ONE
        a12 = ((rnd2(), rnd2(), rnd2()), (rnd2(), rnd2(), rnd2()))
        assert tw.fq12_mul(a12, tw.fq12_inv(a12)) == tw.FQ12_ONE


def test_fq12_frobenius_is_qth_power():
    def rnd2():
        return (rng.randrange(f.Q), rng.randrange(f.Q))

    a12 = ((rnd2(), rnd2(), rnd2()), (rnd2(), rnd2(), rnd2()))
    for power in (1, 2, 3):
        assert tw.fq12_frob(a12, power) == tw.fq12_pow(a12, f.Q**power)


def test_g1_group_law():
    g = cv.G1_GEN
    assert cv.g1_is_on_curve(g)
    assert cv.g1_eq(cv.g1_add(g, g), cv.g1_dbl(g))
    # order: r * G == identity
    assert cv.g1_mul(g, f.R_MOD)[2] == 0
    # random scalar consistency: (a+b)G == aG + bG
    a, b = rng.randrange(f.R_MOD), rng.randrange(f.R_MOD)
    lhs = cv.g1_mul(g, (a + b) % f.R_MOD)
    rhs = cv.g1_add(cv.g1_mul(g, a), cv.g1_mul(g, b))
    assert cv.g1_eq(lhs, rhs)
    # complete formulas handle the identity correctly
    assert cv.g1_eq(cv.g1_add(g, cv.G1_ZERO), g)
    assert cv.g1_eq(cv.g1_add(g, cv.g1_neg(g)), cv.G1_ZERO)


def test_g2_group_law():
    g = cv.G2_GEN
    assert cv.g2_is_on_curve(g)
    assert cv.g2_eq(cv.g2_add(g, g), cv.g2_dbl(g))
    assert cv.g2_mul(g, f.R_MOD)[2] == tw.FQ2_ZERO
    a, b = rng.randrange(f.R_MOD), rng.randrange(f.R_MOD)
    lhs = cv.g2_mul(g, (a + b) % f.R_MOD)
    rhs = cv.g2_add(cv.g2_mul(g, a), cv.g2_mul(g, b))
    assert cv.g2_eq(lhs, rhs)


def test_pairing_bilinearity():
    p = cv.g1_to_affine(cv.G1_GEN)
    q = cv.g2_to_affine(cv.G2_GEN)
    e_pq = pr.pairing(p, q)
    assert e_pq != tw.FQ12_ONE

    a, b = 7, 13
    pa = cv.g1_to_affine(cv.g1_mul(cv.G1_GEN, a))
    qb = cv.g2_to_affine(cv.g2_mul(cv.G2_GEN, b))
    # e(aP, bQ) == e(P, Q)^(ab)
    assert pr.pairing(pa, qb) == tw.fq12_pow(e_pq, a * b)


def test_pairing_product_check():
    # e(P, Q) * e(-P, Q) == 1
    p = cv.g1_to_affine(cv.G1_GEN)
    np_ = cv.g1_to_affine(cv.g1_neg(cv.G1_GEN))
    q = cv.g2_to_affine(cv.G2_GEN)
    assert pr.multi_pairing_is_one([(p, q), (np_, q)])
    assert not pr.multi_pairing_is_one([(p, q), (p, q)])


def test_pairing_has_order_r():
    p = cv.g1_to_affine(cv.G1_GEN)
    q = cv.g2_to_affine(cv.G2_GEN)
    e = pr.pairing(p, q)
    assert tw.fq12_pow(e, f.R_MOD) == tw.FQ12_ONE
