"""TPU-native 256-bit modular arithmetic: 16x16-bit limbs over uint32 lanes.

Design (see SURVEY.md section 7 'hard parts'):

  * A field element batch is a uint32 array of shape (16, N): limb-major
    so the batch dimension N lands in the TPU's 128-wide vector lanes
    and every limb op is a full-width VPU op. (Batch-major (N, 16) would
    waste 7/8 of each lane tile.)
  * Limbs hold 16-bit digits; products of two digits fit exactly in
    uint32, and lazy column accumulation stays far below 2^32
    (<= ~64 terms * 2^16 per column), so no widening type is needed —
    this is the TPU answer to the reference's PTX madc chains
    (/root/reference/icicle/backend/cuda/include/ptx.h).
  * Internal representation is Montgomery with R = 2^256 — the SAME
    radix snarkjs uses on disk, so zkey coefficients and points upload
    with zero conversion (the reference needed explicit from_mont
    kernels, /root/reference/src/cache.rs:208-214).

All functions are jit-traceable, shape-static, and branch-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NLIMB = 16
LIMB_BITS = 16
MASK = np.uint32(0xFFFF)
U32 = jnp.uint32


def int_to_limbs_np(v: int) -> np.ndarray:
    """Python int -> (16,) uint32 limb vector (16-bit digits, LSB first)."""
    return np.array([(v >> (LIMB_BITS * i)) & 0xFFFF for i in range(NLIMB)], dtype=np.uint32)


def ints_to_limbs_np(vals) -> np.ndarray:
    """Iterable of ints -> (16, N) limb-major uint32 array."""
    out = np.empty((NLIMB, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(NLIMB):
            out[i, j] = (v >> (LIMB_BITS * i)) & 0xFFFF
    return out


def limbs_to_ints_np(arr) -> list:
    """(16, N) limb array (numpy or jax) -> list of Python ints."""
    a = np.asarray(arr, dtype=np.uint64)
    n = a.shape[1]
    out = [0] * n
    for i in range(NLIMB):
        shift = LIMB_BITS * i
        for j in range(n):
            out[j] |= int(a[i, j]) << shift
    return out


def u32x8_to_limbs(words: np.ndarray) -> np.ndarray:
    """snarkjs on-disk layout (N, W) of 32-bit words -> (2W, N) 16-bit limbs.

    Zero-copy-ish reinterpretation of mmap'd zkey/wtns data (the analog
    of the reference's from_u8 transmute, conversions.rs:336-343).
    """
    lo = (words & 0xFFFF).astype(np.uint32)
    hi = (words >> 16).astype(np.uint32)
    n, w = words.shape
    out = np.empty((2 * w, n), dtype=np.uint32)
    out[0::2] = lo.T
    out[1::2] = hi.T
    return out


def limbs_to_u32x8(limbs) -> np.ndarray:
    """(2W, N) 16-bit limbs -> (N, W) 32-bit words (snarkjs layout)."""
    a = np.asarray(limbs, dtype=np.uint32)
    return (a[0::2] | (a[1::2] << 16)).T


@dataclass(frozen=True)
class FieldSpec:
    """Compile-time field parameters (the analog of params_gen.h)."""

    modulus: int
    name: str

    def __post_init__(self):
        object.__setattr__(self, "p_limbs", int_to_limbs_np(self.modulus))
        object.__setattr__(self, "n0inv", np.uint32((-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)))
        object.__setattr__(self, "nprime_limbs", int_to_limbs_np((-pow(self.modulus, -1, 1 << 256)) % (1 << 256)))
        r = (1 << 256) % self.modulus
        object.__setattr__(self, "r_mod", r)
        object.__setattr__(self, "r2_limbs", int_to_limbs_np(r * r % self.modulus))
        object.__setattr__(self, "one_mont_limbs", int_to_limbs_np(r))
        object.__setattr__(self, "rinv", pow(1 << 256, -1, self.modulus))


# ----------------------------------------------------------------- core ops

def _carry_canonical(cols, spec: FieldSpec):
    """Carry-propagate >=17 uint32 columns into 16 canonical limbs mod p.

    Input columns may hold up to ~2^26; the propagated integer must be
    < 2p (guaranteed by CIOS for canonical inputs).
    """
    limbs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(len(cols)):
        v = cols[k] + carry
        limbs.append(v & MASK)
        carry = v >> LIMB_BITS
    # value < 2p < 2^255, so limbs beyond 16 and the final carry are zero
    return _cond_sub_p(limbs[:NLIMB], spec)


def _cond_sub_p(limbs, spec: FieldSpec):
    """If value >= p subtract p (single conditional, branch-free)."""
    p = spec.p_limbs
    borrow = jnp.zeros_like(limbs[0])
    sub = []
    for k in range(NLIMB):
        d = limbs[k] - np.uint32(p[k]) - borrow
        sub.append(d & MASK)
        borrow = (d >> 31) & np.uint32(1)  # borrow iff underflow (top bit set)
    ge_p = borrow == 0
    return jnp.stack([jnp.where(ge_p, sub[k], limbs[k]) for k in range(NLIMB)], axis=0)


def add_mod(a, b, spec: FieldSpec):
    """(16, ...) + (16, ...) mod p, canonical in/out."""
    carry = jnp.zeros_like(a[0])
    limbs = []
    for k in range(NLIMB):
        v = a[k] + b[k] + carry
        limbs.append(v & MASK)
        carry = v >> LIMB_BITS
    # a + b < 2p: conditional subtract handles the 2^256 overflow too
    # (carry out of limb 15 implies >= p since p > 2^255... p < 2^254 for
    # BN254, and a+b < 2p < 2^255, so carry is always 0 here)
    return _cond_sub_p(limbs, spec)


def sub_mod(a, b, spec: FieldSpec):
    """(a - b) mod p, canonical in/out."""
    p = spec.p_limbs
    borrow = jnp.zeros_like(a[0])
    diff = []
    for k in range(NLIMB):
        d = a[k] - b[k] - borrow
        diff.append(d & MASK)
        borrow = (d >> 31) & np.uint32(1)
    underflow = borrow != 0
    # add p back where we underflowed
    carry = jnp.zeros_like(a[0])
    fixed = []
    pad = jnp.where(underflow, np.uint32(1), np.uint32(0))
    for k in range(NLIMB):
        v = diff[k] + np.uint32(p[k]) * pad + carry
        fixed.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(fixed, axis=0)


def neg_mod(a, spec: FieldSpec):
    """(-a) mod p; maps 0 to 0."""
    zero = jnp.zeros_like(a)
    return jnp.where(is_zero(a)[None], a, sub_mod(zero, a, spec))


def is_zero(a):
    """(16, ...) -> (...) bool."""
    acc = a[0]
    for k in range(1, NLIMB):
        acc = acc | a[k]
    return acc == 0


def eq(a, b):
    acc = a[0] ^ b[0]
    for k in range(1, NLIMB):
        acc = acc | (a[k] ^ b[k])
    return acc == 0


def mont_mul(a, b, spec: FieldSpec):
    """Montgomery product a * b * R^-1 mod p (CIOS over 16-bit limbs).

    a, b: (16, ...) canonical Montgomery-form limbs; trailing dims
    broadcast (e.g. twiddle (16,1,1,h) * data (16,B,k,h)). Column
    accumulation is slice-wise ((16, ...)-wide vector ops, ~300 HLO ops
    total) with lazy carries: every column stays < 2^23, far below the
    uint32 ceiling, so no widening type is needed.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)[1:]
    acc = jnp.zeros((2 * NLIMB + 1,) + shape, dtype=U32)

    # schoolbook product: 16 slice-accumulated partial products
    for i in range(NLIMB):
        prod = a[i][None] * b  # (16, ...) exact in uint32
        acc = acc.at[i : i + NLIMB].add(prod & MASK)
        acc = acc.at[i + 1 : i + NLIMB + 1].add(prod >> LIMB_BITS)

    # interleaved Montgomery reduction: kill one low column per round
    pbrd = jnp.asarray(spec.p_limbs.reshape((NLIMB,) + (1,) * len(shape)), dtype=U32)
    n0 = spec.n0inv
    for i in range(NLIMB):
        v = acc[i]
        ti = v & MASK
        m = (ti * n0) & MASK
        mprod = m[None] * pbrd
        lo = mprod & MASK
        # column i is never read again; push both its carries upward
        acc = acc.at[i + 1].add((v >> LIMB_BITS) + ((ti + lo[0]) >> LIMB_BITS))
        acc = acc.at[i + 1 : i + NLIMB].add(lo[1:])
        acc = acc.at[i + 1 : i + NLIMB + 1].add(mprod >> LIMB_BITS)

    return _carry_canonical(list(acc[NLIMB:]), spec)


def mont_sqr(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


def mont_reduce(a, spec: FieldSpec):
    """REDC by one factor: a * R^-1 mod p (i.e. mont_mul(a, 1))."""
    one = jnp.zeros_like(a)
    one = one.at[0].set(jnp.ones_like(a[0]))
    return mont_mul(a, one, spec)


def to_mont(a, spec: FieldSpec):
    """Standard form -> Montgomery form: a * R mod p."""
    r2 = jnp.asarray(spec.r2_limbs.reshape((NLIMB,) + (1,) * (a.ndim - 1)), dtype=U32)
    r2 = jnp.broadcast_to(r2, a.shape)
    return mont_mul(a, r2, spec)


def select(mask, a, b):
    """mask: (...) bool; a, b: (16, ...)."""
    return jnp.where(mask[None], a, b)


def const_limbs(v: int, shape=(), spec: FieldSpec | None = None) -> jnp.ndarray:
    """Broadcast a Python int to a (16,) + shape limb array."""
    base = int_to_limbs_np(v).reshape((NLIMB,) + (1,) * len(shape))
    return jnp.broadcast_to(jnp.asarray(base, dtype=U32), (NLIMB,) + tuple(shape))


# ------------------------------------------------------------- field specs

from ..refmath.field import Q as _Q, R_MOD as _R  # noqa: E402

FQ_SPEC = FieldSpec(modulus=_Q, name="bn254_fq")
FR_SPEC = FieldSpec(modulus=_R, name="bn254_fr")
