"""BLS12 pairing oracle tests (reference: pairing/models/bls12.h,
shipped for the bls12-377/381 wrapper crates' pairing API)."""

import pytest

from icicle_snark_tpu.curves import host
from icicle_snark_tpu.curves.pairing import get_pairing
from icicle_snark_tpu.curves.params import get_curve


@pytest.mark.parametrize("name", ["bls12_381", "bls12_377"])
def test_bilinearity(name):
    pr = get_pairing(name)
    p = get_curve(name)
    g1c, g2c = host.g1_curve(p), host.g2_curve(p)
    P, Q = p.g1, p.g2
    aP = g1c.to_affine(g1c.mul_scalar(g1c.from_affine(P), 5))
    bQ = g2c.to_affine(g2c.mul_scalar(g2c.from_affine(Q), 7))
    e1 = pr.pairing(aP, bQ)
    e2 = pr.pairing(P, Q)
    assert pr.fp12.eq(e1, pr.fp12.pow(e2, 35))  # e(5P,7Q) == e(P,Q)^35
    assert not pr.fp12.eq(e2, pr.fp12.one)      # non-degenerate
    assert pr.fp12.eq(pr.fp12.pow(e2, p.r), pr.fp12.one)  # order-r


@pytest.mark.parametrize("name", ["bls12_381", "bls12_377"])
def test_identity_inputs(name):
    pr = get_pairing(name)
    assert pr.fp12.eq(pr.pairing(None, get_curve(name).g2), pr.fp12.one)
