"""Keyless (JWT RS256 + OIDC claims + Poseidon commitment) circuit tests.

Reduced max_jwt_len=512 instance (8 SHA blocks) of the bench family."""

import pytest

from icicle_snark_tpu.refmath.field import R_MOD
from icicle_snark_tpu.setup.keyless_circuit import (
    _b64_char_value,
    _base64url_decode_gadget,
    keyless_circuit,
    keyless_test_vector,
)
from icicle_snark_tpu.setup.sha256_circuit import Builder


def _satisfied(constraints, w):
    def ev(lc):
        return sum(c * w[s] for s, c in lc.items()) % R_MOD

    return all(ev(a) * ev(b) % R_MOD == ev(c) for a, b, c in constraints)


def test_b64_char_table():
    import base64

    alphabet = (b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                b"abcdefghijklmnopqrstuvwxyz0123456789-_")
    for i, c in enumerate(alphabet):
        assert _b64_char_value(c) == i
    assert _b64_char_value(0) == 0


def test_b64_decode_gadget():
    import base64

    raw = b"hello zk world!!"  # 16 bytes -> multiple of 4 b64 chars? pad up
    enc = base64.urlsafe_b64encode(raw).rstrip(b"=")
    # NUL-pad the char stream to a multiple of 4 (masked tail)
    enc += bytes((4 - len(enc) % 4) % 4)
    bld = Builder(0)
    chars = [({bld.alloc(c): 1}, c) for c in enc]
    out = _base64url_decode_gadget(bld, chars)
    got = bytes(v for _, v in out)[: len(raw)]
    assert got == raw
    assert _satisfied(bld.constraints, bld.values)


@pytest.fixture(scope="module")
def small_keyless():
    kwargs, expected_idc = keyless_test_vector(max_jwt_len=512)
    r1cs, wit = keyless_circuit(**kwargs)
    return kwargs, expected_idc, r1cs, wit


def test_keyless_idc(small_keyless):
    _, expected_idc, r1cs, wit = small_keyless
    assert wit[1] == expected_idc % R_MOD
    assert r1cs.n_public == 5


def test_keyless_satisfied(small_keyless):
    _, _, r1cs, wit = small_keyless
    assert _satisfied(r1cs.constraints, wit)


def test_keyless_rejects_tampered_idc(small_keyless):
    _, _, r1cs, wit = small_keyless
    bad = list(wit)
    bad[1] = (bad[1] + 1) % R_MOD
    assert not _satisfied(r1cs.constraints, bad)
