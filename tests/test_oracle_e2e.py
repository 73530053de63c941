"""End-to-end oracle test: R1CS -> trusted setup -> zkey/wtns files ->
pure-Python prove -> pairing-equation verify.

This closes the loop at the host-oracle level and pins down the snarkjs
format semantics (incl. the R^2 Montgomery factor baked into the H
points) before any TPU code runs. The TPU pipeline is then required to
reproduce these proofs byte-for-byte in deterministic mode.
"""

import json

import pytest

from icicle_snark_tpu.refmath import groth16 as oracle
from icicle_snark_tpu.io.wtns import WtnsFile, write_wtns
from icicle_snark_tpu.io.zkey import ZKeyFile
from icicle_snark_tpu.setup.r1cs import (
    complex_circuit,
    complex_circuit_witness,
    multiplier_circuit,
    multiplier_witness,
)
from icicle_snark_tpu.setup.trusted_setup import groth16_setup


@pytest.fixture(scope="module")
def small_circuit(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fixtures")
    r1cs = complex_circuit(8, 12)
    zkey_path = str(tmp / "circuit_final.zkey")
    vk_path = str(tmp / "verification_key.json")
    vk = groth16_setup(r1cs, zkey_path, vk_path)
    wtns_path = str(tmp / "witness.wtns")
    witness = complex_circuit_witness(r1cs, a=3)
    assert r1cs.check_witness(witness)
    write_wtns(wtns_path, witness)
    return r1cs, zkey_path, vk_path, wtns_path, vk, witness


def test_zkey_roundtrip(small_circuit):
    r1cs, zkey_path, _vk, _w, _vkd, _wit = small_circuit
    z = ZKeyFile(zkey_path)
    assert z.header.n_vars == r1cs.n_vars
    assert z.header.n_public == r1cs.n_public
    assert z.header.domain_size >= r1cs.n_constraints + r1cs.n_public + 1
    assert z.header.q == 21888242871839275222246405745257275088696311157297823662689037894645226208583
    assert z.header.r == 21888242871839275222246405745257275088548364400416034343698204186575808495617
    m, c, s, coef = z.coefficients()
    # A records + B records + binding rows
    assert len(m) > 0
    assert z.points_a().shape == (r1cs.n_vars, 16)
    assert z.points_b2().shape == (r1cs.n_vars, 32)
    assert z.points_h().shape == (z.header.domain_size, 16)
    assert z.points_c().shape == (r1cs.n_vars - r1cs.n_public - 1, 16)


def test_wtns_roundtrip(small_circuit):
    _r1cs, _zk, _vk, wtns_path, _vkd, witness = small_circuit
    w = WtnsFile(wtns_path)
    assert w.witness_ints() == witness


def test_oracle_prove_verify(small_circuit):
    _r1cs, zkey_path, vk_path, wtns_path, vk, witness = small_circuit
    proof, public = oracle.prove(zkey_path, wtns_path, deterministic=True)
    assert public == [str(witness[1])]
    assert oracle.verify(proof, public, vk), "pairing check failed"


def test_oracle_rejects_bad_public(small_circuit):
    _r1cs, zkey_path, vk_path, wtns_path, vk, _witness = small_circuit
    proof, public = oracle.prove(zkey_path, wtns_path, deterministic=True)
    bad_public = [str(int(public[0]) + 1)]
    assert not oracle.verify(proof, bad_public, vk)


def test_oracle_randomized_proof_verifies(small_circuit):
    _r1cs, zkey_path, vk_path, wtns_path, vk, _witness = small_circuit
    proof, public = oracle.prove(zkey_path, wtns_path, deterministic=False)
    assert oracle.verify(proof, public, vk)


def test_multiplier_circuit(tmp_path):
    r1cs = multiplier_circuit()
    zkey_path = str(tmp_path / "m.zkey")
    vk = groth16_setup(r1cs, zkey_path)
    witness = multiplier_witness(6, 7)
    assert r1cs.check_witness(witness)
    wtns_path = str(tmp_path / "m.wtns")
    write_wtns(wtns_path, witness)
    proof, public = oracle.prove(zkey_path, wtns_path, deterministic=True)
    assert public == ["42"]
    assert oracle.verify(proof, public, vk)


def test_export_verification_key(small_circuit):
    """zkey -> vk export must equal the vk the setup wrote."""
    _r1cs, zkey_path, vk_path, _w, vk, _wit = small_circuit
    exported = ZKeyFile(zkey_path).export_verification_key()
    assert exported == vk
