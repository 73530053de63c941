"""MXU matmul-NTT differential tests vs the radix-2 VPU transform.

The int8 digit arithmetic is exact by the bounds stated in
ops/mxu_ntt.py; these tests check the whole construction (Toeplitz
digit matmul, mod-p reduce matmul, carry/REDC canonicalization,
four-step recursion + inter-step twiddles) bit-for-bit against
ops.ntt.ntt_natural at leaf, single-split, and double-split sizes."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops import mxu_ntt
from icicle_snark_tpu.ops import ntt as tntt
from icicle_snark_tpu.refmath.field import R_MOD, fr_to_mont

rng = random.Random(5)


def _mont_batch(vals_2d):
    rows = [lb.ints_to_limbs_np([fr_to_mont(v) for v in row]) for row in vals_2d]
    return jnp.stack([jnp.asarray(r) for r in rows], axis=1)  # (16, B, n)


def _vals(b, n):
    return [[rng.randrange(R_MOD) for _ in range(n)] for _ in range(b)]


@pytest.mark.parametrize("log_n", [4, 8])
def test_leaf_dft_matches_radix2(log_n):
    x = _mont_batch(_vals(2, 1 << log_n))
    dom = tntt.get_domain(log_n)
    want = np.asarray(tntt.ntt_natural(x, dom, inverse=False))
    got = np.asarray(mxu_ntt.ntt_mxu(x, log_n, inverse=False))
    assert np.array_equal(want, got)


@pytest.mark.parametrize("log_n", [9, 10])
def test_four_step_matches_radix2(log_n):
    """One recursion level (n1=128 x n2=4/8)."""
    x = _mont_batch(_vals(1, 1 << log_n))
    dom = tntt.get_domain(log_n)
    want = np.asarray(tntt.ntt_natural(x, dom, inverse=False))
    got = np.asarray(mxu_ntt.ntt_mxu(x, log_n, inverse=False))
    assert np.array_equal(want, got)


def test_inverse_roundtrip():
    log_n = 9
    x = _mont_batch(_vals(1, 1 << log_n))
    y = mxu_ntt.ntt_mxu(x, log_n, inverse=False)
    back = np.asarray(mxu_ntt.ntt_mxu(y, log_n, inverse=True))
    assert np.array_equal(np.asarray(x), back)


def test_inverse_matches_radix2():
    log_n = 8
    x = _mont_batch(_vals(1, 1 << log_n))
    dom = tntt.get_domain(log_n)
    want = np.asarray(tntt.ntt_natural(x, dom, inverse=True))
    got = np.asarray(mxu_ntt.ntt_mxu(x, log_n, inverse=True))
    assert np.array_equal(want, got)


def test_double_recursion():
    """Two four-step levels: 2^16 = 128 x (128 x 4): exercises the
    chunked lax.map path too (M = n2*B rows > CHUNK_M)."""
    log_n = 16
    x = _mont_batch(_vals(1, 1 << log_n))
    dom = tntt.get_domain(log_n)
    want = np.asarray(tntt.ntt_natural(x, dom, inverse=False))
    got = np.asarray(mxu_ntt.ntt_mxu(x, log_n, inverse=False))
    assert np.array_equal(want, got)


def test_prove_with_mxu_coset(tmp_path, monkeypatch):
    """End-to-end prove with the MXU coset path forced on a tiny domain:
    must produce the SAME deterministic proof as the VPU path."""
    from icicle_snark_tpu.io.wtns import write_wtns
    from icicle_snark_tpu.prover import pipeline
    from icicle_snark_tpu.prover.cache import CacheManager
    from icicle_snark_tpu.refmath import groth16 as oracle
    from icicle_snark_tpu.setup.r1cs import complex_circuit, complex_circuit_witness
    from icicle_snark_tpu.setup.trusted_setup import groth16_setup

    r1cs = complex_circuit(20, 26)  # domain 32
    zkey = str(tmp_path / "c.zkey")
    vk = groth16_setup(r1cs, zkey)
    wtns = str(tmp_path / "c.wtns")
    write_wtns(wtns, complex_circuit_witness(r1cs, a=7))
    cache = CacheManager().get(zkey)

    monkeypatch.setenv("ISTPU_MXU_NTT_MIN_LOG", "0")
    proof_vpu, public_vpu = pipeline.prove(wtns, cache, deterministic=True)
    monkeypatch.setenv("ISTPU_MXU_NTT_MIN_LOG", "2")
    proof_mxu, public_mxu = pipeline.prove(wtns, cache, deterministic=True)
    assert proof_mxu == proof_vpu and public_mxu == public_vpu
    assert oracle.verify(proof_mxu, public_mxu, vk)
