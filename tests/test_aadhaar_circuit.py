"""AadhaarVerifier circuit family — gadget units + reduced end-to-end.

The full-size build (maxDataLength=1536, ~900k constraints) is the
bench fixture; tests use a reduced maxDataLength=320 instance of the
same structure (5 SHA blocks instead of 24)."""

import pytest

from icicle_snark_tpu.refmath.field import R_MOD
from icicle_snark_tpu.setup.aadhaar_circuit import (
    _array_selector,
    _digit_bytes_to_number,
    _digits_to_timestamp,
    _log2_circom,
    _subarray_selector,
    aadhaar_test_vector,
    aadhaar_verifier_circuit,
)
from icicle_snark_tpu.setup.sha256_circuit import Builder


def _satisfied(constraints, w):
    def ev(lc):
        return sum(c * w[s] for s, c in lc.items()) % R_MOD

    return all(ev(a) * ev(b) % R_MOD == ev(c) for a, b, c in constraints)


def test_log2_circom():
    # circom's log2: 1536 -> 12, 2048 -> 12, 16 -> 5
    assert _log2_circom(1536) == 12
    assert _log2_circom(2048) == 12
    assert _log2_circom(16) == 5


def test_subarray_selector():
    bld = Builder(0)
    vals = [10, 20, 30, 40, 50, 60, 70, 80]
    arr = [({bld.alloc(v): 1}, v) for v in vals]
    start_s = bld.alloc(3)
    length_s = bld.alloc(2)
    out = _subarray_selector(bld, arr, {start_s: 1}, 3, {length_s: 1}, 2, 4)
    assert [v for _, v in out] == [40, 50, 0, 0]
    assert _satisfied(bld.constraints, bld.values)


def test_array_selector():
    bld = Builder(0)
    vals = [11, 22, 33, 44]
    arr = [({bld.alloc(v): 1}, v) for v in vals]
    idx = bld.alloc(2)
    lc, v = _array_selector(bld, arr, {idx: 1}, 2, 4)
    assert v == 33
    assert _satisfied(bld.constraints, bld.values)


def test_digit_bytes_to_number():
    bld = Builder(0)
    items = [({bld.alloc(ord(c)): 1}, ord(c)) for c in "2024"]
    lc, v = _digit_bytes_to_number(items)
    assert v == 2024


def test_digits_to_timestamp_vs_calendar():
    import calendar

    bld = Builder(0)

    def const(v):
        return ({0: v}, v)

    for (y, m, d, h) in [(2024, 1, 15, 9), (1999, 12, 31, 23), (2024, 3, 1, 0),
                         (1970, 1, 1, 0), (2023, 2, 28, 12)]:
        lc, v = _digits_to_timestamp(bld, const(y), const(m), const(d), const(h))
        assert v == calendar.timegm((y, m, d, h, 0, 0)), (y, m, d, h)
    assert _satisfied(bld.constraints, bld.values)


@pytest.fixture(scope="module")
def small_aadhaar():
    kwargs, expected = aadhaar_test_vector(max_data_length=320)
    r1cs, wit = aadhaar_verifier_circuit(**kwargs)
    return kwargs, expected, r1cs, wit


def test_aadhaar_outputs(small_aadhaar):
    _, expected, r1cs, wit = small_aadhaar
    names = ["pubkeyHash", "nullifier", "timestamp", "ageAbove18",
             "gender", "state", "pinCode"]
    for i, name in enumerate(names):
        assert wit[1 + i] == expected[name] % R_MOD, name
    # public inputs trail the outputs (snarkjs ordering)
    assert wit[8] == 12345678 and wit[9] == 1


def test_aadhaar_satisfied(small_aadhaar):
    _, _, r1cs, wit = small_aadhaar
    assert r1cs.n_public == 9
    assert _satisfied(r1cs.constraints, wit)


def test_aadhaar_rejects_tampered_nullifier(small_aadhaar):
    _, _, r1cs, wit = small_aadhaar
    bad = list(wit)
    bad[2] = (bad[2] + 1) % R_MOD
    assert not _satisfied(r1cs.constraints, bad)
