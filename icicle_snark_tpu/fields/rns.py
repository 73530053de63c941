"""Residue-number-system field representation (groundwork).

The AI-ASIC-native path to fast 256-bit arithmetic (ROADMAP.md item 3,
cf. PAPERS.md "Enabling AI ASICs for ZKP"): a field element is a vector
of residues modulo k small coprime moduli. Channel-wise mul/add have NO
carry chains — each channel is one 32-bit multiply plus a pseudo-
Mersenne fold — and the base-extension steps of RNS-Montgomery
reduction are matmuls by constant matrices (MXU fodder).

This module delivers the representation layer and channel arithmetic:
  * modulus selection (pseudo-Mersenne q = 2^14 - eps, eps < 2^7)
  * positional (16x16-bit limb) -> RNS via an exact u32 matmul
  * channel add/sub/mul with exact folds
  * host-side CRT reconstruction (test oracle)
The RNS-Montgomery reduction (Bajard/Kawamura base extension) lands in
a later round; see ROADMAP.md for the worked design.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import NLIMB, U32

CH_BITS = 14
CH_BASE = 1 << CH_BITS


def _pseudo_mersenne_moduli(count: int, max_eps: int = 512) -> list:
    """Primes of the form 2^14 - eps (largest first)."""

    def is_prime(v: int) -> bool:
        if v < 2:
            return False
        for f in range(2, int(v ** 0.5) + 1):
            if v % f == 0:
                return False
        return True

    out = []
    for eps in range(1, max_eps):
        q = CH_BASE - eps
        if is_prime(q):
            out.append(q)
            if len(out) == count:
                return out
    raise ValueError("not enough pseudo-Mersenne moduli")


@dataclass(frozen=True)
class RnsSpec:
    """An RNS base: k coprime pseudo-Mersenne channels."""

    k: int

    def __post_init__(self):
        q = _pseudo_mersenne_moduli(self.k)
        object.__setattr__(self, "q", np.asarray(q, dtype=np.uint32))
        object.__setattr__(self, "eps", CH_BASE - np.asarray(q, dtype=np.int64))
        m = 1
        for v in q:
            m *= int(v)
        object.__setattr__(self, "M", m)
        # to_rns matrix: (32 eight-bit limbs) x k, entries 2^(8j) mod q_i
        t = np.zeros((2 * NLIMB, self.k), dtype=np.uint32)
        for j in range(2 * NLIMB):
            for i, qi in enumerate(q):
                t[j, i] = pow(2, 8 * j, int(qi))
        object.__setattr__(self, "to_rns_mat", t)
        # CRT constants (host reconstruction)
        object.__setattr__(
            self,
            "crt_terms",
            [((m // int(qi)) * pow(m // int(qi), -1, int(qi))) % m for qi in q],
        )


def channel_reduce(t: jnp.ndarray, spec: RnsSpec) -> jnp.ndarray:
    """Fold (..., k) u32 values < 2^32 into canonical residues < q_i.

    Pseudo-Mersenne: 2^14 == eps (mod q) with eps < 2^9, so
    t_hi*2^14 + t_lo == t_hi*eps + t_lo. Four folds bring any u32
    below 2^15 (bounds: 2^32 -> <2^28 -> <2^24 -> <2^20 -> <2^15),
    then two conditional subtracts reach canonical (< 2q boundary can
    be crossed by at most one extra q)."""
    eps = jnp.asarray(spec.eps.astype(np.uint32))
    q = jnp.asarray(spec.q)
    mask = np.uint32(CH_BASE - 1)
    for _ in range(4):
        t = (t >> np.uint32(CH_BITS)) * eps + (t & mask)
    t = jnp.where(t >= q, t - q, t)
    return jnp.where(t >= q, t - q, t)


def to_rns(limbs: jnp.ndarray, spec: RnsSpec) -> jnp.ndarray:
    """(16, N) 16-bit limb array -> (N, k) residues.

    Exact u32 matmul: 8-bit sub-limbs (< 2^8) times table entries
    (< 2^14) summed over 32 terms stay < 2^27."""
    lo = (limbs & np.uint32(0xFF)).astype(U32)
    hi = (limbs >> np.uint32(8)).astype(U32)
    sub = jnp.stack([lo, hi], axis=1).reshape(2 * NLIMB, -1)  # (32, N)
    mat = jnp.asarray(spec.to_rns_mat)  # (32, k)
    acc = jnp.einsum("jn,jk->nk", sub, mat, preferred_element_type=U32)
    return channel_reduce(acc, spec)


def from_rns_host(res: np.ndarray, spec: RnsSpec) -> list:
    """(N, k) residues -> python ints mod M (test oracle)."""
    out = []
    for row in np.asarray(res):
        v = 0
        for r, term in zip(row, spec.crt_terms):
            v += int(r) * term
        out.append(v % spec.M)
    return out


def rns_add(a, b, spec: RnsSpec):
    q = jnp.asarray(spec.q)
    t = a + b
    return jnp.where(t >= q, t - q, t)


def rns_sub(a, b, spec: RnsSpec):
    q = jnp.asarray(spec.q)
    t = a + q - b
    return jnp.where(t >= q, t - q, t)


def rns_mul(a, b, spec: RnsSpec):
    """Channel products < 2^28; one fold chain back to canonical."""
    return channel_reduce(a * b, spec)


def _rns_spec_offset(k: int, offset: int) -> RnsSpec:
    """An RnsSpec skipping the first `offset` pseudo-Mersenne primes
    (disjoint bases for Montgomery-RNS)."""
    all_q = _pseudo_mersenne_moduli(k + offset)
    spec = RnsSpec.__new__(RnsSpec)
    object.__setattr__(spec, "k", k)
    q = np.asarray(all_q[offset:], dtype=np.uint32)
    object.__setattr__(spec, "q", q)
    object.__setattr__(spec, "eps", CH_BASE - q.astype(np.int64))
    m = 1
    for v in q:
        m *= int(v)
    object.__setattr__(spec, "M", m)
    t = np.zeros((2 * NLIMB, k), dtype=np.uint32)
    for j in range(2 * NLIMB):
        for i, qi in enumerate(q):
            t[j, i] = pow(2, 8 * j, int(qi))
    object.__setattr__(spec, "to_rns_mat", t)
    object.__setattr__(
        spec,
        "crt_terms",
        [((m // int(qi)) * pow(m // int(qi), -1, int(qi))) % m for qi in q],
    )
    return spec


# default base: 20 channels -> M ~ 2^279, comfortably > BN254 p
DEFAULT_SPEC = RnsSpec(k=20)


# ------------------------------------------------------- Montgomery-RNS

def _split7(x):
    """(N, k) u32 < 2^14 -> lo/hi 7-bit halves for exact u32 matmuls."""
    return x & np.uint32(0x7F), x >> np.uint32(7)


class RnsMontCtx:
    """Exact RNS-Montgomery multiplication context over BN254 Fq/Fr.

    Bajard-style reduction with Kawamura fixed-point base extension:

      d    = x*y                      (channelwise, both bases)
      qhat = d * (-p)^-1   in base A  (channelwise)
      qhat -> base B via sigma-matmul; the full-range extension may
              overshoot by +M_A (gamma ambiguity of 1) — absorbed by
              the redundant output domain r < ~2.2p
      r    = (d + qhat*p) * M_A^-1    (channelwise in base B)
      r    -> base A via the second extension, EXACT because
              r << M_B (the f32 gamma floor has 2^-10 headroom)

    All values live in BOTH bases simultaneously ((N,k) + (N,k)
    residues); the Montgomery radix is M_A. The matmuls are by constant
    (k x k) tables with 7-bit-split operands so every u32 accumulation
    is exact — and they are the MXU-offload target.
    """

    def __init__(self, p: int, k: int = 20):
        self.p = p
        self.A = DEFAULT_SPEC if k == 20 else RnsSpec(k=k)
        self.B = _rns_spec_offset(k, k)
        A, B = self.A, self.B
        assert A.M > 40 * p and B.M > 40 * p, "bases too small for exact gammas"
        qA = [int(v) for v in A.q]
        qB = [int(v) for v in B.q]

        self.negp_inv_A = np.asarray(
            [pow(-p, -1, qi) % qi for qi in qA], dtype=np.uint32
        )
        self.w_A = np.asarray(
            [pow(A.M // qi, -1, qi) for qi in qA], dtype=np.uint32
        )
        self.w_B = np.asarray(
            [pow(B.M // qj, -1, qj) for qj in qB], dtype=np.uint32
        )
        self.T_AB = np.asarray(
            [[(A.M // qi) % qj for qj in qB] for qi in qA], dtype=np.uint32
        )
        self.T7_AB = np.asarray(
            [[((A.M // qi) << 7) % qj for qj in qB] for qi in qA], dtype=np.uint32
        )
        self.T_BA = np.asarray(
            [[(B.M // qj) % qi for qi in qA] for qj in qB], dtype=np.uint32
        )
        self.T7_BA = np.asarray(
            [[((B.M // qj) << 7) % qi for qi in qA] for qj in qB], dtype=np.uint32
        )
        self.MA_mod_B = np.asarray([A.M % qj for qj in qB], dtype=np.uint32)
        self.MB_mod_A = np.asarray([B.M % qi for qi in qA], dtype=np.uint32)
        self.MAinv_B = np.asarray(
            [pow(A.M, -1, qj) for qj in qB], dtype=np.uint32
        )
        self.p_B = np.asarray([p % qj for qj in qB], dtype=np.uint32)
        self.inv_qA_f32 = (1.0 / A.q.astype(np.float64)).astype(np.float32)
        self.inv_qB_f32 = (1.0 / B.q.astype(np.float64)).astype(np.float32)

    # -- conversions -----------------------------------------------------
    def to_rns2(self, limbs):
        """(16, N) limbs -> (resA, resB)."""
        return to_rns(limbs, self.A), to_rns(limbs, self.B)

    def from_rns2_host(self, xa, xb=None) -> list:
        """Reconstruct ints (< A.M) from base-A residues (oracle)."""
        return from_rns_host(np.asarray(xa), self.A)

    # -- base extension ---------------------------------------------------
    def _extend(self, sigma, T, T7, M_mod, inv_q_f32, dst_spec, offset: float):
        lo, hi = _split7(sigma)
        Tm = jnp.asarray(T)
        T7m = jnp.asarray(T7)
        acc = jnp.einsum("nk,kj->nj", lo, Tm, preferred_element_type=U32) + \
              jnp.einsum("nk,kj->nj", hi, T7m, preferred_element_type=U32)
        acc = channel_reduce(acc, dst_spec)
        fsum = sigma.astype(jnp.float32) @ jnp.asarray(inv_q_f32)
        gamma = jnp.floor(fsum + np.float32(offset)).astype(U32)  # (N,)
        corr = channel_reduce(gamma[:, None] * jnp.asarray(M_mod), dst_spec)
        return rns_sub(acc, corr, dst_spec)

    # -- the multiply ------------------------------------------------------
    def mont_mul(self, x, y):
        """(xa, xb) * (ya, yb) -> (ra, rb) with r == x*y*M_A^-1 (mod p),
        r < ~2.2p (redundant domain, closed under this operation)."""
        xa, xb = x
        ya, yb = y
        A, B = self.A, self.B
        da = rns_mul(xa, ya, A)
        db = rns_mul(xb, yb, B)
        qhat = rns_mul(da, jnp.asarray(self.negp_inv_A), A)
        sigma = rns_mul(qhat, jnp.asarray(self.w_A), A)
        # full-range extension: bias the gamma floor DOWN (-2^-9) so the
        # f32 error can only yield gamma or gamma-1 — i.e. qhat or
        # qhat + M_A, never the negative qhat - M_A. The +M_A overshoot
        # is absorbed by the redundant output bound (< ~2p).
        qhat_B = self._extend(
            sigma, self.T_AB, self.T7_AB, self.MA_mod_B, self.inv_qA_f32, B,
            -1.0 / 512.0,
        )
        t = rns_add(db, rns_mul(qhat_B, jnp.asarray(self.p_B), B), B)
        rb = rns_mul(t, jnp.asarray(self.MAinv_B), B)
        # exact extension back: r/M_B < 2^-23, so biasing the floor UP
        # (+2^-9) swamps both the true fraction and the f32 error ->
        # gamma is exact
        sigma2 = rns_mul(rb, jnp.asarray(self.w_B), B)
        ra = self._extend(
            sigma2, self.T_BA, self.T7_BA, self.MB_mod_A, self.inv_qB_f32, A,
            1.0 / 512.0,
        )
        return ra, rb


DEFAULT_MONT_FQ = None  # built lazily (see mont_ctx_fq)


def mont_ctx_fq() -> RnsMontCtx:
    global DEFAULT_MONT_FQ
    if DEFAULT_MONT_FQ is None:
        from ..refmath.field import Q

        DEFAULT_MONT_FQ = RnsMontCtx(Q)
    return DEFAULT_MONT_FQ
