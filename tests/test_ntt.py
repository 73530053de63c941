"""NTT differential tests: JAX bitrev/DIT/DIF kernels vs the oracle NTT."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops import ntt as tntt
from icicle_snark_tpu.refmath.field import R_MOD, W, fr_from_mont, fr_to_mont
from icicle_snark_tpu.refmath.groth16 import ntt as oracle_ntt

rng = random.Random(7)


def _to_mont_limbs(vals):
    return lb.ints_to_limbs_np([fr_to_mont(v) for v in vals])


def _from_mont_limbs(arr):
    return [fr_from_mont(v) for v in lb.limbs_to_ints_np(arr)]


def test_powers_mont():
    base = rng.randrange(R_MOD)
    p = tntt.powers_mont(base, 5)
    got = _from_mont_limbs(p)
    assert got == [pow(base, i, R_MOD) for i in range(32)]


def test_bitrev_permutation():
    rev = tntt.bitrev_permutation(3)
    assert rev.tolist() == [0, 4, 2, 6, 1, 5, 3, 7]


def _run_ntt(vals, log_n, inverse):
    dom = tntt.get_domain(log_n)
    x = _to_mont_limbs(vals).reshape(lb.NLIMB, 1, len(vals))
    f = jax.jit(lambda a: tntt.ntt_natural(a, dom, inverse=inverse))
    out = f(jnp.asarray(x))
    return _from_mont_limbs(np.asarray(out).reshape(lb.NLIMB, len(vals)))


def test_forward_ntt_matches_oracle():
    log_n = 6
    n = 1 << log_n
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    got = _run_ntt(vals, log_n, inverse=False)
    want = oracle_ntt(vals, W[log_n])
    assert got == want


def test_inverse_ntt_roundtrip():
    log_n = 5
    n = 1 << log_n
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    fwd = _run_ntt(vals, log_n, inverse=False)
    back = _run_ntt(fwd, log_n, inverse=True)
    assert back == vals


def test_inverse_matches_oracle():
    log_n = 4
    n = 1 << log_n
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    got = _run_ntt(vals, log_n, inverse=True)
    want = oracle_ntt(vals, W[log_n], invert=True)
    assert got == want


def test_bitrev_pipeline_composition():
    """intt_dif -> elementwise key mul (bitrev order) -> ntt_dit equals the
    natural-order INTT -> key mul -> NTT (the prove pipeline's coset path,
    reference proof_helper.rs:116-147)."""
    log_n = 5
    n = 1 << log_n
    dom = tntt.get_domain(log_n)
    rev = tntt.bitrev_permutation(log_n)
    vals = [rng.randrange(R_MOD) for _ in range(n)]
    inc = W[log_n + 1]
    keys = [pow(inc, i, R_MOD) for i in range(n)]

    # oracle path
    coeffs = oracle_ntt(vals, W[log_n], invert=True)
    shifted = [coeffs[i] * keys[i] % R_MOD for i in range(n)]
    want = oracle_ntt(shifted, W[log_n])

    # TPU path, no reorders
    x = jnp.asarray(_to_mont_limbs(vals).reshape(lb.NLIMB, 1, n))
    keys_bitrev = _to_mont_limbs([keys[rev[i]] for i in range(n)]).reshape(lb.NLIMB, 1, n)

    def pipeline(a, kb):
        y = tntt.intt_dif(a, dom.tw_inv, dom.n_inv_mont)
        y = lb.mont_mul(y, kb, lb.FR_SPEC)
        return tntt.ntt_dit(y, dom.tw_fwd)

    out = jax.jit(pipeline)(x, jnp.asarray(keys_bitrev))
    got = _from_mont_limbs(np.asarray(out).reshape(lb.NLIMB, n))
    assert got == want


def test_batch_ntt():
    log_n = 4
    n = 1 << log_n
    dom = tntt.get_domain(log_n)
    batches = [[rng.randrange(R_MOD) for _ in range(n)] for _ in range(3)]
    x = np.stack([_to_mont_limbs(b) for b in batches], axis=1)  # (16, 3, n)
    out = jax.jit(lambda a: tntt.ntt_natural(a, dom))(jnp.asarray(x))
    for b in range(3):
        got = _from_mont_limbs(np.asarray(out)[:, b, :])
        assert got == oracle_ntt(batches[b], W[log_n])
