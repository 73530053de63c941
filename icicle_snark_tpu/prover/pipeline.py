"""The Groth16 prove pipeline on TPU.

Mirrors the reference's value flow exactly
(/root/reference/src/proof_helper.rs:31-317) so proofs are bit-exact,
but maps each stage to its TPU-native form:

  stage                reference (CUDA)                      here (JAX/XLA)
  -------------------  ------------------------------------  -------------------------
  witness ingest       mmap + H2D + from_mont kernel         zero-copy u32 -> limb view
  R1CS evaluation      mul_scalars + SERIAL host scatter     gather + mont_mul +
                       (proof_helper.rs:75-92)               segment_sum + wide REDC
  A*B -> C             device vector mul                     mont_mul
  coset evaluation     INTT/NTT batch=3 + key-powers mul     reorder-free bitrev INTT/
                       (ntt_helper, icicle_helper.rs:356)    NTT pair, keys pre-bitrev
  h values             L*R-O on coset (proof_helper.rs:152)  mont_mul/sub + R^2 fixup
  5 MSMs               Pippenger on 2 CUDA streams           ops.msm window pipeline
  randomization        host projective ops via FFI           refmath host points
  serialization        decimal strings (conversions.rs:267)  same format, same bytes

Montgomery bookkeeping (R = 2^256, the snarkjs on-disk radix):
  coef_disk = c*R, witness = w (standard)
  prod      = mont_mul(coef_disk, w) = c*w           == res*R, res per reference
  a_vals    = redc(segment_sum(prod)) = sum(res)     (standard — matches oracle)
  c_vals    = mont_mul(a, b) = a*b*R^-1              (carries R^-1)
  coset     = mont_mul(x, key*R) = x*key             (factors preserved)
  h_raw     = mont_mul(A_odd, B_odd) - C_odd         == h*R^-1
  h         = mont_mul(h_raw, R^2)                   (the H MSM scalar integers)
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import serve_lean
from ..fields import limbs as lb
from ..fields.limbs import FR_SPEC, NLIMB
from ..ops import msm as msm_ops
from ..ops import ntt as ntt_ops
from ..refmath import curve as cv
from ..refmath.field import R_MOD, MONT_R_FR
from ..refmath.groth16 import serialize_proof
from ..io.wtns import WtnsFile
from .cache import R1CSPlan, ZKeyCache

import time

_R2_FR = MONT_R_FR * MONT_R_FR % R_MOD


def _segment_reduce(prod, segments, num_segments, level2):
    """Exact modular segmented sum of canonical (16, n) limb values.

    Limb-wise integer segment_sum (each 16-bit limb column accumulates
    < 2^16 terms, so uint32 never overflows), then one wide Montgomery
    reduction back to canonical form. Two-level plans (fan-in >= 2^15)
    chunk first and re-reduce; the extra R^-1 picked up by the second
    REDC is repaid by the caller via `carries_extra_rinv`.
    """
    def segsum_redc(vals, seg, nseg):
        # (16, n) -> (17, n) lazy columns via segment_sum, then REDC
        cols = jax.vmap(
            lambda row: jax.ops.segment_sum(row, seg, num_segments=nseg)
        )(vals)
        cols = jnp.concatenate([cols, jnp.zeros((1,) + cols.shape[1:], lb.U32)], axis=0)
        return lb.redc_wide(cols, FR_SPEC)

    out = segsum_redc(prod, segments, num_segments)
    if level2 is not None:
        seg2, nseg2 = level2
        out = segsum_redc(out, seg2, nseg2)
    return out


# dual_mode_jit == jax.jit unless ISTPU_SERVE_LEAN=1, which serves the
# first prove from a compile-lean twin while this unrolled module
# compiles in the background (serve_lean.py; ROADMAP first-prove table)
@serve_lean.dual_mode_jit(static_argnames=("num_segments", "nseg2", "log_n", "use_mxu"))
def _construct_r1cs_jit(
    witness, coefs, witness_idx, segments, num_segments,
    seg2, nseg2, keys, tw_fwd, tw_inv, n_inv_mont, log_n, use_mxu=False,
    mxu_mats=None,
):
    """witness (16, n_vars) standard limbs -> h scalars (16, n) standard.

    `keys` is the coset key-power table in NATURAL order; the VPU
    pipeline derives its bit-reversed gather in-graph (only one table
    stays HBM-resident — 256 MB saved at 2^22)."""
    n = 1 << log_n

    # ---- R1CS evaluation: one gather + batched mul + segment reduce
    wit_g = jnp.take(witness, witness_idx, axis=1)
    prod = lb.mont_mul(coefs, wit_g, FR_SPEC)  # = res * R (Montgomery form)
    level2 = (seg2, nseg2) if seg2 is not None else None
    ab = _segment_reduce(prod, segments, num_segments, level2)
    # slots [0, n) = A poly, [n, 2n) = B poly; slot 2n is padding
    a_vals = ab[:, :n]
    b_vals = ab[:, n : 2 * n]
    if level2 is not None:
        # second REDC stripped an extra R; restore standard form
        a_vals = lb.to_mont(a_vals, FR_SPEC)
        b_vals = lb.to_mont(b_vals, FR_SPEC)

    # ---- C = A*B pointwise (carries R^-1; repaid in the h fixup)
    c_vals = lb.mont_mul(a_vals, b_vals, FR_SPEC)

    # ---- coset evaluation, batch=3
    vec = jnp.stack([a_vals, b_vals, c_vals], axis=1)  # (16, 3, n)
    if use_mxu:
        odd = _coset_eval_mxu(
            vec, keys, log_n, tw_fwd, tw_inv, n_inv_mont, mxu_mats
        )
    else:
        keys_br = keys[:, ntt_ops.bitrev_indices_ingraph(log_n)]
        coeffs_br = ntt_ops.intt_dif(vec, tw_inv, n_inv_mont)
        shifted = lb.mont_mul(coeffs_br, keys_br[:, None, :], FR_SPEC)
        odd = ntt_ops.ntt_dit(shifted, tw_fwd)

    # ---- h = (A*B - C) on the coset, then repay the R^-1
    h_raw = lb.sub_mod(lb.mont_mul(odd[:, 0], odd[:, 1], FR_SPEC), odd[:, 2], FR_SPEC)
    r2 = lb.const_limbs(_R2_FR, (1,))
    return lb.mont_mul(h_raw, r2, FR_SPEC)


# Above this domain power the one-shot graph's temp memory exceeds HBM
# (measured 12.96 GB at 2^22: the unrolled NTT stages' chunked muls
# defeat XLA buffer reuse), so the computation runs as per-polynomial
# staged jits with a forcing sync between them.
SPLIT_NTT_POWER = int(os.environ.get("ISTPU_SPLIT_NTT_POWER", "22"))

# At and above this domain power the coset evaluation runs on the MXU
# matmul-NTT (ops/mxu_ntt.py; measured 1.4x at 2^18, 2.0x at 2^20 over
# the radix-2 VPU pipeline, batch 3, v5e). 0 disables. Read per call so
# tests can force either path.
def _use_mxu_ntt(log_n: int) -> bool:
    min_log = int(os.environ.get("ISTPU_MXU_NTT_MIN_LOG", "18"))
    return bool(min_log) and log_n >= min_log


def _coset_eval_mxu(vals, keys_natural, log_n: int, tw_fwd, tw_inv,
                    n_inv_mont, mxu_mats):
    """Natural-order coset evaluation on the MXU: INTT -> key powers ->
    NTT. vals (16, B, n); keys (16, n) natural order; tw_fwd/tw_inv the
    natural domain power tables and mxu_mats = (mats_fwd, mats_inv) the
    Toeplitz device matrices — all threaded through as JIT ARGUMENTS
    (closed-over tables were inlined as dense HLO literals; the 2^21
    step table alone was a 134 MB literal -> remote-compile HTTP 413)."""
    from ..ops import mxu_ntt

    mats_fwd, mats_inv = mxu_mats
    coeff = mxu_ntt._ntt_mxu_jit.__wrapped__(
        vals, tw_inv, n_inv_mont, mats_inv, log_n, True
    )
    shifted = lb.mont_mul(coeff, keys_natural[:, None, :], FR_SPEC)
    return mxu_ntt._ntt_mxu_jit.__wrapped__(
        shifted, tw_fwd, n_inv_mont, mats_fwd, log_n, False
    )


def _force(x):
    # block_until_ready does not block over the remote-TPU tunnel
    np.asarray(jax.device_get(x.ravel()[:1]))


@partial(jax.jit, static_argnames=("num_segments", "nseg2", "log_n"))
def _r1cs_eval_jit(witness, coefs, witness_idx, segments, num_segments,
                   seg2, nseg2, log_n):
    n = 1 << log_n
    wit_g = jnp.take(witness, witness_idx, axis=1)
    prod = lb.mont_mul(coefs, wit_g, FR_SPEC)
    level2 = ((seg2, nseg2) if seg2 is not None else None)
    ab = _segment_reduce(prod, segments, num_segments, level2)
    a_vals = ab[:, :n]
    b_vals = ab[:, n : 2 * n]
    if level2 is not None:
        a_vals = lb.to_mont(a_vals, FR_SPEC)
        b_vals = lb.to_mont(b_vals, FR_SPEC)
    return a_vals, b_vals


@jax.jit
def _mul_jit(a, b):
    return lb.mont_mul(a, b, FR_SPEC)


@partial(jax.jit, static_argnames=("use_mxu", "log_n"))
def _coset_eval_jit(vals, keys, tw_fwd, tw_inv, n_inv_mont,
                    use_mxu=False, log_n=0, mxu_mats=None):
    """One polynomial: INTT -> coset key powers -> NTT (batch=1).
    `keys` NATURAL order (VPU path bit-reverses in-graph)."""
    if use_mxu:
        return _coset_eval_mxu(
            vals[:, None, :], keys, log_n, tw_fwd, tw_inv, n_inv_mont,
            mxu_mats,
        )[:, 0]
    keys_br = keys[:, ntt_ops.bitrev_indices_ingraph(log_n)]
    coeffs_br = ntt_ops.intt_dif(vals[:, None, :], tw_inv, n_inv_mont)
    shifted = lb.mont_mul(coeffs_br, keys_br[:, None, :], FR_SPEC)
    return ntt_ops.ntt_dit(shifted, tw_fwd)[:, 0]


@jax.jit
def _h_from_odd_jit(odd_a, odd_b, odd_c):
    h_raw = lb.sub_mod(lb.mont_mul(odd_a, odd_b, FR_SPEC), odd_c, FR_SPEC)
    r2 = lb.const_limbs(_R2_FR, (1,))
    return lb.mont_mul(h_raw, r2, FR_SPEC)


def construct_r1cs(witness, cache: ZKeyCache):
    """Device h-scalar computation (reference: construct_r1cs,
    proof_helper.rs:31-170)."""
    plan = cache.plan
    log_n = cache.header.power
    dom = ntt_ops.get_domain(log_n)
    seg2, nseg2 = (plan.level2 if plan.level2 is not None else (None, 0))
    use_mxu = _use_mxu_ntt(log_n)
    mxu_mats = None
    if use_mxu:
        from ..ops import mxu_ntt

        mxu_ntt._ensure_constants(log_n, True)   # eager: caches must
        mxu_ntt._ensure_constants(log_n, False)  # not capture tracers
        # Toeplitz matrices ride as jit ARGUMENTS (closed-over device
        # arrays inline as dense HLO literals -> HTTP 413 at 2^21)
        mxu_mats = (
            mxu_ntt.mxu_mats(log_n, False), mxu_ntt.mxu_mats(log_n, True)
        )
    keys = cache.keys  # natural order; VPU path bit-reverses in-graph
    if log_n < SPLIT_NTT_POWER:
        return _construct_r1cs_jit(
            witness, plan.coefs, plan.witness_idx, plan.segments, plan.num_segments,
            seg2, nseg2, keys, dom.tw_fwd, dom.tw_inv, dom.n_inv_mont,
            log_n, use_mxu, mxu_mats,
        )
    # large domains: stage the phases, forcing between them so each
    # graph's temp buffers are freed before the next launches
    a_vals, b_vals = _r1cs_eval_jit(
        witness, plan.coefs, plan.witness_idx, plan.segments,
        plan.num_segments, seg2, nseg2, log_n,
    )
    _force(b_vals)
    c_vals = _mul_jit(a_vals, b_vals)
    odd_a = _coset_eval_jit(
        a_vals, keys, dom.tw_fwd, dom.tw_inv, dom.n_inv_mont, use_mxu, log_n,
        mxu_mats,
    )
    _force(odd_a)
    odd_b = _coset_eval_jit(
        b_vals, keys, dom.tw_fwd, dom.tw_inv, dom.n_inv_mont, use_mxu, log_n,
        mxu_mats,
    )
    _force(odd_b)
    odd_c = _coset_eval_jit(
        c_vals, keys, dom.tw_fwd, dom.tw_inv, dom.n_inv_mont, use_mxu, log_n,
        mxu_mats,
    )
    _force(odd_c)
    return _h_from_odd_jit(odd_a, odd_b, odd_c)


def groth16_commitments(witness, h_scalars, cache: ZKeyCache):
    """The 5 MSMs (reference: groth16_commitments, proof_helper.rs:172-241).

    Returns host projective points (standard-form ints):
      pi_a  = <witness, A>          (G1)
      pi_b1 = <witness, B1>         (G1)
      pi_b  = <witness, B2>         (G2)
      pi_c  = <witness[npub+1:], C> (G1)
      pi_h  = <h, H>                (G1)
    """
    npub = cache.header.n_public
    wit_c = witness[:, npub + 1 :]
    groups = [
        (witness, cache.points_a),
        (witness, cache.points_b1),
        (wit_c, cache.points_c),
        (h_scalars, cache.points_h),
    ]
    total = sum(s.shape[-1] for s, _ in groups)
    n2 = witness.shape[-1]
    # window sizes + precompute factors are BAKED at cache build (the
    # base copies were shifted for exactly these window sizes); G2 runs
    # alone (1 group, half the slice width) on its own optimum
    # (reference analog: per-MSM decision trees, cpu_msm.hpp:76-158)
    pre, pre2 = cache.msm_pre, cache.msm_pre2
    c = cache.msm_c or msm_ops.choose_c(
        min(total, msm_ops.MSM_MAX_LANES), groups=len(groups)
    )
    c2 = cache.msm_c2 or msm_ops.choose_c(
        min(n2, msm_ops.MSM_MAX_LANES // 2), groups=1
    )

    # dispatch BOTH pipelines before fetching either, so the G2 MSM
    # executes on device while the host fetches G1 window sums and runs
    # the Horner ladders (the role of the reference's second CUDA
    # stream, proof_helper.rs:191-206). Out of core, the same applies
    # to the final G2 slices.
    if total * pre > msm_ops.MSM_MAX_LANES:
        # complete the R1CS/NTT chain before staging MSM slices so its
        # multi-GB 2^22-domain transients are freed first (out-of-core
        # HBM headroom; tiny forcing fetch — block_until_ready does not
        # block over the remote-TPU tunnel)
        np.asarray(jax.device_get(h_scalars.ravel()[:1]))
        ws1 = msm_ops.msm_windows_sliced(
            groups, c, 32, False, msm_ops.MSM_MAX_LANES, precompute=pre
        )
    else:
        ws1 = msm_ops._msm_g1_jit(
            tuple(s for s, _ in groups), tuple(p for _, p in groups), c, 32,
            pre,
        )
    if n2 * pre2 > msm_ops.MSM_MAX_LANES // 2:
        ws2 = msm_ops.msm_windows_sliced(
            [(witness, cache.points_b2)], c2, 32, True,
            msm_ops.MSM_MAX_LANES // 2, precompute=pre2,
        )
    else:
        ws2 = msm_ops._msm_g2_jit((witness,), (cache.points_b2,), c2, 32, pre2)

    # ONE bulk D2H fetch per pipeline (single stacked output buffer)
    ws1_np = np.asarray(ws1)
    pi_a, pi_b1, pi_c, pi_h = (
        msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws1_np, g), c)
        for g in range(4)
    )
    pi_b = msm_ops.horner_combine(
        msm_ops.window_points_to_host_g2(np.asarray(ws2), 0), c2, g2=True
    )
    return pi_a, pi_b1, pi_b, pi_c, pi_h


class PhaseTimer:
    """Per-phase wall timings for a prove (the aux-subsystem analog of
    the reference's MEASURE_MSM_TIMES hook, cpu_msm.hpp:31-33). Timings
    include XLA async boundaries only where a download forces sync, so
    treat them as coarse attribution, not kernel truth — use
    jax.profiler traces for that."""

    def __init__(self):
        self.phases = {}
        self._t = time.perf_counter()

    def mark(self, name: str):
        now = time.perf_counter()
        self.phases[name] = self.phases.get(name, 0.0) + (now - self._t)
        self._t = now


def prove(wtns_path: str, cache: ZKeyCache, deterministic: bool = False, rng=None,
          timer: PhaseTimer | None = None):
    """Full prove from a witness file against a warm cache.

    Returns (proof_dict, public_signals). The final randomization and
    point arithmetic run on host exactly like the reference
    (proof_helper.rs:274-295) — it is O(1) scalar work.
    """
    timer = timer or PhaseTimer()
    hdr = cache.header
    wtns = WtnsFile(wtns_path)
    if wtns.header.q != hdr.r:
        raise ValueError("witness curve does not match proving key")
    if wtns.header.n_witness != hdr.n_vars:
        raise ValueError(
            f"invalid witness length: circuit {hdr.n_vars}, witness {wtns.header.n_witness}"
        )

    wit_words = wtns.witness_limbs()  # (n_vars, 8) u32, standard form
    # upload raw words (half the bytes), limb-split on device
    witness = lb.u32x8_to_limbs_device(jnp.asarray(wit_words))  # (16, n_vars)
    timer.mark("witness_ingest")

    h_scalars = construct_r1cs(witness, cache)
    timer.mark("r1cs_ntt_dispatch")
    pi_a, pi_b1, pi_b, pi_c, pi_h = groth16_commitments(witness, h_scalars, cache)
    timer.mark("msm")

    # ---- randomization + assembly (host; mirrors proof_helper.rs:274-295)
    alpha1 = cv.g1_from_affine(hdr.vk_alpha_1)
    beta1 = cv.g1_from_affine(hdr.vk_beta_1)
    delta1 = cv.g1_from_affine(hdr.vk_delta_1)
    beta2 = cv.g2_from_affine(hdr.vk_beta_2)
    delta2 = cv.g2_from_affine(hdr.vk_delta_2)

    if deterministic:
        r = s = 1  # reference `no-randomness` feature (proof_helper.rs:287-295)
    else:
        import secrets

        r = (rng or secrets).randbelow(R_MOD)
        s = (rng or secrets).randbelow(R_MOD)

    pi_a = cv.g1_add(pi_a, cv.g1_add(alpha1, cv.g1_mul(delta1, r)))
    pi_b = cv.g2_add(pi_b, cv.g2_add(beta2, cv.g2_mul(delta2, s)))
    pi_b1 = cv.g1_add(pi_b1, cv.g1_add(beta1, cv.g1_mul(delta1, s)))
    pi_c = cv.g1_add(pi_c, pi_h)
    pi_c = cv.g1_add(pi_c, cv.g1_mul(pi_a, s))
    pi_c = cv.g1_add(pi_c, cv.g1_mul(pi_b1, r))
    pi_c = cv.g1_add(pi_c, cv.g1_neg(cv.g1_mul(delta1, r * s % R_MOD)))

    timer.mark("randomize_assemble")
    public_signals = [str(v) for v in wtns.witness_ints(1, hdr.n_public)]
    timer.mark("serialize")
    return serialize_proof(pi_a, pi_b, pi_c), public_signals
