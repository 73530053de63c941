"""RSA circuit family tests (the `benchmark/rsa` analog,
RSAVerify65537(64, 32) over circom-bigint-style FpMul)."""

import pytest

from icicle_snark_tpu.setup.rsa_circuit import (
    rsa_test_vector,
    rsa_verify_circuit,
)


@pytest.fixture(scope="module")
def vector():
    return rsa_test_vector()


def test_valid_signature_verifies(vector):
    sig, n, h = vector
    r1cs, wit = rsa_verify_circuit(sig, n, h)
    assert r1cs.check_witness(wit)
    assert r1cs.n_public == 32
    # same constraint class as the compiled reference circuit (~160k)
    assert 130_000 < r1cs.n_constraints < 190_000


def test_structure_is_input_independent(vector):
    sig, n, h = vector
    r1, _ = rsa_verify_circuit(sig, n, h)
    sig2, n2, h2 = rsa_test_vector(b"a different message")
    r2, w2 = rsa_verify_circuit(sig2, n2, h2)
    assert len(r1.constraints) == len(r2.constraints)
    assert r1.n_vars == r2.n_vars
    # same-key witness satisfies; note the r1/r2 structures differ only
    # in nothing (identical allocation order), so cross-check one:
    assert r1.constraints[:1000] == r2.constraints[:1000]


def test_invalid_signature_rejected(vector):
    sig, n, h = vector
    with pytest.raises(AssertionError):
        rsa_verify_circuit(sig + 1, n, h)


def test_rsa_sha256_composite():
    """The anon_aadhaar SignatureVerifier core: in-circuit SHA-256
    feeding PKCS#1 v1.5 RSA verification."""
    from icicle_snark_tpu.setup.rsa_circuit import (
        rsa_sha256_test_vector,
        rsa_sha256_verify_circuit,
    )

    msg, sig, n = rsa_sha256_test_vector()
    r1cs, wit = rsa_sha256_verify_circuit(msg, sig, n)
    assert r1cs.check_witness(wit)
    assert 180_000 < r1cs.n_constraints < 240_000
    with pytest.raises(AssertionError):
        rsa_sha256_verify_circuit(msg, sig + 1, n)
