"""Keccak-256 circuit family tests (the `benchmark/keccak256` analog,
vocdoni keccak256-circom Keccak(256,256))."""

import os

from icicle_snark_tpu.setup import keccak_circuit as kc

_M = (1 << 64) - 1


def _rotl(v, n):
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _M


def _keccak_f(A):
    for rnd in range(24):
        C = [A[x][0] ^ A[x][1] ^ A[x][2] ^ A[x][3] ^ A[x][4] for x in range(5)]
        D = [C[(x - 1) % 5] ^ _rotl(C[(x + 1) % 5], 1) for x in range(5)]
        A = [[A[x][y] ^ D[x] for y in range(5)] for x in range(5)]
        B = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B[y][(2 * x + 3 * y) % 5] = _rotl(A[x][y], kc._RHO[x][y])
        A = [
            [B[x][y] ^ ((~B[(x + 1) % 5][y]) & B[(x + 2) % 5][y]) & _M for y in range(5)]
            for x in range(5)
        ]
        A[0][0] ^= kc._RC[rnd]
    return A


def keccak256_ref(msg: bytes) -> bytes:
    """Reference Keccak-256 (ethereum padding 0x01/0x80)."""
    rate = 136
    p = bytearray(msg) + b"\x01" + b"\x00" * (rate - len(msg) % rate - 1)
    p[-1] |= 0x80
    A = [[0] * 5 for _ in range(5)]
    for off in range(0, len(p), rate):
        blk = p[off : off + rate]
        for i in range(rate // 8):
            x, y = i % 5, i // 5
            A[x][y] ^= int.from_bytes(blk[i * 8 : (i + 1) * 8], "little")
        A = _keccak_f(A)
    out = b"".join(A[i % 5][i // 5].to_bytes(8, "little") for i in range(4))
    return out[:32]


def _bits(msg: bytes) -> list:
    return [(msg[i // 8] >> (i % 8)) & 1 for i in range(8 * len(msg))]


def test_reference_known_answer():
    assert (
        keccak256_ref(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_digest_matches_reference():
    msg = bytes(range(32))
    r1cs, wit = kc.keccak256_circuit(_bits(msg))
    assert kc.digest_from_witness(wit) == keccak256_ref(msg)
    assert r1cs.check_witness(wit)


def test_structure_and_size():
    r1, _ = kc.keccak256_circuit(_bits(bytes(32)))
    r2, w2 = kc.keccak256_circuit(_bits(bytes(range(32))))
    assert r1.constraints == r2.constraints  # input-independent
    assert r1.check_witness(w2)
    # vocdoni keccak256-circom: ~151k constraints for one permutation
    assert 140_000 < r1.n_constraints < 165_000
    assert r1.n_public == 256
