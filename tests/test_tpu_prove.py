"""Differential e2e: the TPU pipeline must reproduce the oracle prover
byte-for-byte in deterministic mode (the reference's correctness bar:
snarkjs-verified outputs, SURVEY.md section 4)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.io.wtns import write_wtns
from icicle_snark_tpu.prover import api as prover_api
from icicle_snark_tpu.prover import pipeline
from icicle_snark_tpu.prover.cache import CacheManager
from icicle_snark_tpu.refmath import groth16 as oracle
from icicle_snark_tpu.refmath.field import R_MOD
from icicle_snark_tpu.setup.r1cs import complex_circuit, complex_circuit_witness
from icicle_snark_tpu.setup.trusted_setup import groth16_setup


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tpu_fixtures")
    r1cs = complex_circuit(40, 50)  # domain will be 64
    zkey_path = str(tmp / "circuit_final.zkey")
    vk_path = str(tmp / "verification_key.json")
    vk = groth16_setup(r1cs, zkey_path, vk_path)
    wtns_path = str(tmp / "witness.wtns")
    witness = complex_circuit_witness(r1cs, a=7)
    assert r1cs.check_witness(witness)
    write_wtns(wtns_path, witness)
    return tmp, zkey_path, vk_path, wtns_path, vk, witness


def test_h_scalars_match_oracle(fixture):
    _tmp, zkey_path, _vk, wtns_path, _vkd, witness = fixture
    from icicle_snark_tpu.io.zkey import ZKeyFile

    cm = CacheManager()
    cache = cm.get(zkey_path)
    wit_limbs = jnp.asarray(
        lb.ints_to_limbs_np([w % R_MOD for w in witness])
    )
    h_dev = pipeline.construct_r1cs(wit_limbs, cache)
    got = lb.limbs_to_ints_np(np.asarray(h_dev))

    want = oracle.compute_h_scalars(ZKeyFile(zkey_path), witness)
    assert got == want


def test_prove_bitexact_vs_oracle(fixture):
    _tmp, zkey_path, _vk, wtns_path, vk, _wit = fixture
    cm = CacheManager()
    cache = cm.get(zkey_path)
    proof_tpu, public_tpu = pipeline.prove(wtns_path, cache, deterministic=True)
    proof_ref, public_ref = oracle.prove(zkey_path, wtns_path, deterministic=True)
    assert public_tpu == public_ref
    assert proof_tpu == proof_ref
    assert oracle.verify(proof_tpu, public_tpu, vk)


def test_api_files_roundtrip(fixture):
    tmp, zkey_path, vk_path, wtns_path, _vk, _wit = fixture
    proof_path = str(tmp / "proof.json")
    public_path = str(tmp / "public.json")
    cm = CacheManager()
    elapsed = prover_api.groth16_prove(
        wtns_path, zkey_path, proof_path, public_path, cm, deterministic=True
    )
    assert elapsed > 0
    assert prover_api.groth16_verify(proof_path, public_path, vk_path)

    # warm-cache second prove reuses the device-resident key
    assert cm.contains(zkey_path)
    prover_api.groth16_prove(
        wtns_path, zkey_path, proof_path, public_path, cm, deterministic=True
    )
    assert prover_api.groth16_verify(proof_path, public_path, vk_path)


def test_randomized_proof_verifies(fixture):
    _tmp, zkey_path, vk_path, wtns_path, vk, _wit = fixture
    cm = CacheManager()
    cache = cm.get(zkey_path)
    proof, public = pipeline.prove(wtns_path, cache, deterministic=False)
    assert oracle.verify(proof, public, vk)


def test_chunked_msm_matches_direct(fixture):
    """Out-of-core sliced MSM == single-shot MSM (same window sums)."""
    from icicle_snark_tpu.ops import msm as msm_ops
    from icicle_snark_tpu.prover.cache import CacheManager

    _tmp, zkey_path, _vk, wtns_path, _vkd, _wit = fixture
    cache = CacheManager().get(zkey_path)
    from icicle_snark_tpu.io.wtns import WtnsFile

    wit = jnp.asarray(lb.u32x8_to_limbs(WtnsFile(wtns_path).witness_limbs()))
    c = 8
    direct = msm_ops.msm_g1(wit, cache.points_a, c=c, k=8)
    ws = msm_ops._msm_windows_chunked(wit, cache.points_a, c, 8, False, 16)
    sliced = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws, 0), c)
    from icicle_snark_tpu.refmath import curve as cv

    assert cv.g1_to_affine(direct) == cv.g1_to_affine(sliced)
