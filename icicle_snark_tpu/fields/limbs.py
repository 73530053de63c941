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

import contextlib
import threading
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import os

NLIMB = 16
LIMB_BITS = 16
MASK = np.uint32(0xFFFF)
U32 = jnp.uint32

# lax.scan unroll factor for the CIOS rounds: 1 = smallest graph
# (fastest compile), 16 = fully unrolled (no scan overhead at runtime).
MONT_UNROLL_DEFAULT = int(os.environ.get("ISTPU_MONT_UNROLL", "1"))

# lax.scan unroll factor for the limb carry/borrow chains (add_mod,
# sub_mod, _carry_canonical, _cond_sub_p, redc_wide). These chains are
# the dominant HLO-op population of the big composite graphs (a point
# add carries ~26 of them); full unroll (>= nlimb) reproduces the
# classic unrolled ripple graph, 1 collapses each chain to a ~5-op
# scan body — ~3x smaller graphs, which is what makes cold XLA:CPU
# compiles (driver dryrun, tests) fit their budget.
CARRY_UNROLL_DEFAULT = int(os.environ.get("ISTPU_CARRY_UNROLL", "16"))

# Per-thread override of the knobs above (set by unroll_mode). Thread-
# local so concurrent traces in different threads — the serve-lean
# background unrolled compile vs a foreground lean trace — each see
# their own mode with no lock and no cross-thread pollution.
_MODE_TLS = threading.local()


def carry_unroll() -> int:
    """The active carry-chain unroll factor (trace-time read)."""
    return getattr(_MODE_TLS, "carry", CARRY_UNROLL_DEFAULT)


def mont_unroll() -> int:
    """The active CIOS-round unroll factor (trace-time read)."""
    return getattr(_MODE_TLS, "mont", MONT_UNROLL_DEFAULT)


@contextlib.contextmanager
def unroll_mode(carry: int | None = None, mont: int | None = None):
    """Trace-scope override of the carry/CIOS unroll factors.

    The knobs are read at TRACE time (not import time), so the same
    Python function traced under different modes yields different
    graphs: unroll_mode(1, 1) produces the compile-lean lax.scan graphs
    (~3x smaller HLO, ~2.3x faster cold compiles — ROADMAP first-prove
    table), the default the classic fully-unrolled ripple graphs
    (fastest on TPU: pmadd 60.7 vs 67.2 ns/lane).

    The override is THREAD-LOCAL: entering the scope never blocks on
    or perturbs a trace running in another thread (the serve-lean
    background unrolled compile can trace for tens of seconds while a
    foreground lean trace proceeds). `None` means "keep the enclosing
    scope's value" (or the module/env default at top level).
    """
    prev_carry = getattr(_MODE_TLS, "carry", None)
    prev_mont = getattr(_MODE_TLS, "mont", None)
    if carry is not None:
        _MODE_TLS.carry = carry
    if mont is not None:
        _MODE_TLS.mont = mont
    try:
        yield
    finally:
        for attr, prev in (("carry", prev_carry), ("mont", prev_mont)):
            if prev is None:
                if hasattr(_MODE_TLS, attr):
                    delattr(_MODE_TLS, attr)
            else:
                setattr(_MODE_TLS, attr, prev)



def int_to_limbs_np(v: int, nlimb: int = NLIMB) -> np.ndarray:
    """Python int -> (nlimb,) uint32 limb vector (16-bit digits, LSB first)."""
    return np.array([(v >> (LIMB_BITS * i)) & 0xFFFF for i in range(nlimb)], dtype=np.uint32)


def ints_to_limbs_np(vals, nlimb: int = NLIMB) -> np.ndarray:
    """Iterable of ints -> (nlimb, N) limb-major uint32 array."""
    out = np.empty((nlimb, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(nlimb):
            out[i, j] = (v >> (LIMB_BITS * i)) & 0xFFFF
    return out


def limbs_to_ints_np(arr) -> list:
    """(nlimb, N) limb array (numpy or jax) -> list of Python ints."""
    a = np.asarray(arr, dtype=np.uint64)
    n = a.shape[1]
    out = [0] * n
    for i in range(a.shape[0]):
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


@jax.jit
def u32x8_to_limbs_device(words: jnp.ndarray) -> jnp.ndarray:
    """Device-side version of u32x8_to_limbs: upload the raw (N, W)
    32-bit words (HALF the bytes of the expanded limb array — matters
    over slow host<->device links) and split into (2W, N) 16-bit limbs
    on device."""
    t = jnp.transpose(words)  # (W, N)
    lo = t & np.uint32(0xFFFF)
    hi = t >> np.uint32(16)
    return jnp.stack([lo, hi], axis=1).reshape(2 * t.shape[0], t.shape[1])


@dataclass(frozen=True)
class FieldSpec:
    """Compile-time field parameters (the analog of params_gen.h).

    Limb count derives from the modulus: nlimb = ceil(bits/16) rounded
    so that 2p < 2^(16*nlimb) (the lazy-carry bound _carry_canonical
    relies on); the Montgomery radix is R = 2^(16*nlimb). For BN254
    (254-bit) this gives the 16-limb / R=2^256 layout that matches the
    snarkjs on-disk radix exactly; wider curves (bls12-377/381 Fq,
    bw6-761) get 24/24/48 limbs."""

    modulus: int
    name: str

    def __post_init__(self):
        bits = self.modulus.bit_length()
        nlimb = -(-(bits + 1) // LIMB_BITS)  # 2p must fit
        object.__setattr__(self, "nlimb", nlimb)
        rbits = LIMB_BITS * nlimb
        object.__setattr__(self, "radix_bits", rbits)
        object.__setattr__(self, "p_limbs", int_to_limbs_np(self.modulus, nlimb))
        object.__setattr__(self, "n0inv", np.uint32((-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)))
        object.__setattr__(self, "nprime_limbs", int_to_limbs_np((-pow(self.modulus, -1, 1 << rbits)) % (1 << rbits), nlimb))
        r = (1 << rbits) % self.modulus
        object.__setattr__(self, "r_mod", r)
        object.__setattr__(self, "r2_limbs", int_to_limbs_np(r * r % self.modulus, nlimb))
        object.__setattr__(self, "one_mont_limbs", int_to_limbs_np(r, nlimb))
        object.__setattr__(self, "rinv", pow(1 << rbits, -1, self.modulus))


# ----------------------------------------------------------------- core ops

def _lean(n: int) -> bool:
    """True -> compile-lean lax.scan carry chains (small graphs for the
    1-core XLA:CPU hosts: tests, driver dryrun); False -> the classic
    fully-unrolled Python-loop graphs (measured fastest on TPU: pmadd
    60.7 vs 67.2 ns/lane, and far faster XLA:TPU compiles)."""
    return carry_unroll() < n


def _carry_scan(cols):
    """Carry-propagate (K, ...) uint32 columns -> (K, ...) 16-bit limbs.

    Ripple over the column axis (work-optimal: each step is 3 ops over
    one column's lanes); the final carry out is dropped — callers
    guarantee the value fits K limbs."""
    if not _lean(cols.shape[0]):
        limbs = []
        carry = jnp.zeros_like(cols[0])
        for k in range(cols.shape[0]):
            v = cols[k] + carry
            limbs.append(v & MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(limbs, axis=0)

    def body(carry, v):
        v = v + carry
        return v >> LIMB_BITS, v & MASK

    _, limbs = jax.lax.scan(
        body, jnp.zeros_like(cols[0]), cols, unroll=carry_unroll()
    )
    return limbs


def _carry_canonical(cols, spec: FieldSpec):
    """Carry-propagate >=17 uint32 columns into 16 canonical limbs mod p.

    Input columns may hold up to ~2^26; the propagated integer must be
    < 2p (guaranteed by CIOS for canonical inputs).
    """
    cols = jnp.stack(cols, axis=0) if isinstance(cols, (list, tuple)) else cols
    # value < 2p < 2^(16*nlimb), so higher limbs and the final carry are zero
    return _cond_sub_p(_carry_scan(cols)[: spec.nlimb], spec)


def _cond_sub_p(limbs, spec: FieldSpec):
    """If value >= p subtract p (single conditional, branch-free)."""
    limbs = jnp.stack(limbs, axis=0) if isinstance(limbs, (list, tuple)) else limbs
    if not _lean(spec.nlimb):
        p = spec.p_limbs
        borrow = jnp.zeros_like(limbs[0])
        sub = []
        for k in range(spec.nlimb):
            d = limbs[k] - np.uint32(p[k]) - borrow
            sub.append(d & MASK)
            borrow = (d >> 31) & np.uint32(1)  # borrow iff underflow
        ge_p = borrow == 0
        return jnp.stack(
            [jnp.where(ge_p, sub[k], limbs[k]) for k in range(spec.nlimb)], axis=0
        )
    p = jnp.asarray(spec.p_limbs, dtype=U32)

    def body(borrow, lp):
        l, pk = lp
        d = l - pk - borrow
        return (d >> 31) & np.uint32(1), d & MASK

    borrow, sub = jax.lax.scan(
        body, jnp.zeros_like(limbs[0]), (limbs, p), unroll=carry_unroll()
    )
    ge_p = borrow == 0
    return jnp.where(ge_p[None], sub, limbs)


def add_mod(a, b, spec: FieldSpec):
    """(16, ...) + (16, ...) mod p, canonical in/out."""
    if not _lean(a.shape[0]):
        carry = jnp.zeros_like(a[0])
        limbs = []
        for k in range(a.shape[0]):
            v = a[k] + b[k] + carry
            limbs.append(v & MASK)
            carry = v >> LIMB_BITS
        return _cond_sub_p(limbs, spec)

    def body(carry, ab):
        v = ab[0] + ab[1] + carry
        return v >> LIMB_BITS, v & MASK

    _, limbs = jax.lax.scan(
        body, jnp.zeros_like(a[0] + b[0]), (a, b), unroll=carry_unroll()
    )
    # a + b < 2p: conditional subtract handles the 2^256 overflow too
    # (carry out of limb 15 implies >= p since p > 2^255... p < 2^254 for
    # BN254, and a+b < 2p < 2^255, so carry is always 0 here)
    return _cond_sub_p(limbs, spec)


def sub_mod(a, b, spec: FieldSpec):
    """(a - b) mod p, canonical in/out."""
    if not _lean(spec.nlimb):
        p = spec.p_limbs
        borrow = jnp.zeros_like(a[0])
        diff = []
        for k in range(spec.nlimb):
            d = a[k] - b[k] - borrow
            diff.append(d & MASK)
            borrow = (d >> 31) & np.uint32(1)
        underflow = borrow != 0
        carry = jnp.zeros_like(a[0])
        fixed = []
        pad = jnp.where(underflow, np.uint32(1), np.uint32(0))
        for k in range(spec.nlimb):
            v = diff[k] + np.uint32(p[k]) * pad + carry
            fixed.append(v & MASK)
            carry = v >> LIMB_BITS
        return jnp.stack(fixed, axis=0)

    p = jnp.asarray(spec.p_limbs, dtype=U32)

    def body(borrow, ab):
        d = ab[0] - ab[1] - borrow
        return (d >> 31) & np.uint32(1), d & MASK

    borrow, diff = jax.lax.scan(
        body, jnp.zeros_like(a[0] - b[0]), (a, b), unroll=carry_unroll()
    )
    underflow = borrow != 0
    # add p back where we underflowed
    pad = jnp.where(underflow, np.uint32(1), np.uint32(0))

    def body2(carry, dp):
        v = dp[0] + dp[1] * pad + carry
        return v >> LIMB_BITS, v & MASK

    _, fixed = jax.lax.scan(
        body2, jnp.zeros_like(diff[0]), (diff, p), unroll=carry_unroll()
    )
    return fixed


def neg_mod(a, spec: FieldSpec):
    """(-a) mod p; maps 0 to 0."""
    zero = jnp.zeros_like(a)
    return jnp.where(is_zero(a)[None], a, sub_mod(zero, a, spec))


def is_zero(a):
    """(nlimb, ...) -> (...) bool."""
    acc = a[0]
    for k in range(1, a.shape[0]):
        acc = acc | a[k]
    return acc == 0


def eq(a, b):
    acc = a[0] ^ b[0]
    for k in range(1, a.shape[0]):
        acc = acc | (a[k] ^ b[k])
    return acc == 0


# Wide-mul lane chunking: a single XLA fusion of the CIOS graph falls
# off a cliff once its intermediates outgrow VMEM (measured on v5e:
# 325 Mmul/s at 2^16 lanes, 227 at 2^18, 38 at 2^20 — see PROFILE.md).
# Muls wider than ~2 * this target are split into lane chunks driven by
# lax.map, keeping each fusion VMEM-resident. 0 disables.
MUL_CHUNK_LANES = int(os.environ.get("ISTPU_MUL_CHUNK_LANES", str(1 << 16)))


def _pick_chunks(total: int, target: int) -> int:
    """Smallest chunk count >= total/target that divides total (1 if
    no divisor exists within 4x of the ideal count)."""
    nc0 = -(-total // target)
    for nc in range(nc0, min(total, 4 * nc0) + 1):
        if total % nc == 0:
            return nc
    return 1


def mont_mul(a, b, spec: FieldSpec, unroll: int | None = None):
    """Montgomery product a * b * R^-1 mod p; wide calls are chunked
    (see MUL_CHUNK_LANES) and each chunk runs the CIOS scan core."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    lanes = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
    if MUL_CHUNK_LANES and lanes >= 2 * MUL_CHUNK_LANES:
        nc = _pick_chunks(lanes, MUL_CHUNK_LANES)
        if nc > 1:
            lc = lanes // nc
            af = jnp.broadcast_to(a, shape).reshape(spec.nlimb, nc, lc)
            bf = jnp.broadcast_to(b, shape).reshape(spec.nlimb, nc, lc)
            out = jax.lax.map(
                lambda ab: _mont_mul_core(ab[0], ab[1], spec, unroll),
                (jnp.moveaxis(af, 1, 0), jnp.moveaxis(bf, 1, 0)),
            )
            return jnp.moveaxis(out, 0, 1).reshape(shape)
    return _mont_mul_core(a, b, spec, unroll)


def _mont_mul_core(a, b, spec: FieldSpec, unroll: int | None = None):
    """CIOS Montgomery product core (one lane chunk).

    a, b: (16, ...) canonical Montgomery-form limbs; trailing dims
    broadcast (e.g. twiddle (16,1,1,h) * data (16,B,k,h)).

    Shape: a lax.scan over the 16 CIOS rounds — each round multiplies
    one scanned limb into the running 17-column accumulator, folds in
    m*p, and shifts down one limb. The compiled graph holds ONE ~25-op
    round body (x unroll) instead of a ~350-op unrolled chain, which is
    what keeps XLA compile times of the big composite kernels (point
    adds, NTT stages, MSM) tractable. Lazy carries: every column stays
    < 2^23 (16 rounds x <2^18 growth), far below the uint32 ceiling.
    The round chain is the sequential dependency CIOS has anyway, so
    runtime cost is just scan overhead (tunable via `unroll`).
    """
    # scan over the operand with the smaller batch so the xs array is
    # the cheap one; the other operand is read in full every round.
    a_size = int(np.prod(a.shape[1:], dtype=np.int64)) if a.ndim > 1 else 1
    b_size = int(np.prod(b.shape[1:], dtype=np.int64)) if b.ndim > 1 else 1
    if a_size > b_size:
        a, b = b, a
    nlimb = spec.nlimb
    shape = jnp.broadcast_shapes(a.shape, b.shape)[1:]
    b = jnp.broadcast_to(b, (nlimb,) + shape)

    pbrd = jnp.asarray(spec.p_limbs.reshape((nlimb,) + (1,) * len(shape)), dtype=U32)
    n0 = spec.n0inv
    ztop = jnp.zeros((1,) + shape, dtype=U32)

    def round_(acc, a_i):
        # acc: (17, ...) lazy columns; a_i: (...)
        prod = a_i[None] * b  # (16, ...), exact in uint32
        t = acc + jnp.concatenate([prod & MASK, ztop]) \
                + jnp.concatenate([ztop, prod >> LIMB_BITS])
        m = ((t[0] & MASK) * n0) & MASK
        mp = m[None] * pbrd
        t = t + jnp.concatenate([mp & MASK, ztop]) \
              + jnp.concatenate([ztop, mp >> LIMB_BITS])
        # t[0] == 0 mod 2^16 by construction; shift down one limb
        carry0 = t[0] >> LIMB_BITS
        nxt = jnp.concatenate([(t[1] + carry0)[None], t[2:], ztop])
        return nxt, None

    acc0 = jnp.zeros((nlimb + 1,) + shape, dtype=U32)
    xs = jnp.broadcast_to(a, (nlimb,) + shape)
    acc, _ = jax.lax.scan(round_, acc0, xs, unroll=unroll or mont_unroll())
    return _carry_canonical(acc, spec)


def mont_sqr(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


def redc_wide(cols, spec: FieldSpec):
    """Montgomery-reduce a LAZY 17-column value: X * R^-1 mod p.

    cols: (17, ...) uint32 columns, each < 2^31, representing
    X = sum_k cols[k] * 2^(16k) < 2^272 < R*p. This is the reduction
    half of CIOS run standalone — used to canonicalize segment-summed
    accumulations (the TPU replacement for the reference's serial
    scatter-accumulate, /root/reference/src/proof_helper.rs:81-92).
    Per-column growth during the loop stays < 2^32: initial 2^31 plus
    carry pushes (< 2^17) plus 15 lo-limb adds (< 2^20).
    """
    n_cols = cols.shape[0]
    nlimb = spec.nlimb
    assert n_cols == nlimb + 1
    shape = cols.shape[1:]

    pbrd = jnp.asarray(spec.p_limbs.reshape((nlimb,) + (1,) * len(shape)), dtype=U32)
    n0 = spec.n0inv

    if not _lean(nlimb):
        acc = jnp.zeros((2 * nlimb + 1,) + shape, dtype=U32)
        acc = acc.at[:n_cols].set(cols)
        for i in range(nlimb):
            v = acc[i]
            ti = v & MASK
            m = (ti * n0) & MASK
            mprod = m[None] * pbrd
            lo = mprod & MASK
            acc = acc.at[i + 1].add((v >> LIMB_BITS) + ((ti + lo[0]) >> LIMB_BITS))
            acc = acc.at[i + 1 : i + nlimb].add(lo[1:])
            acc = acc.at[i + 1 : i + nlimb + 1].add(mprod >> LIMB_BITS)
        return _carry_canonical(acc[nlimb:], spec)

    z1 = jnp.zeros((1,) + shape, dtype=U32)

    # Sliding-window scan over the nlimb REDC rounds: the carried state
    # w holds columns [i, i+nlimb] of the classic double-width
    # accumulator; each round folds m*p into the window, shifts down one
    # column, and pulls in the next high column (always zero here — the
    # input has only nlimb+1 columns). Same arithmetic (and the same
    # < 2^32 per-column growth bound) as the unrolled formulation, in a
    # ~15-op scan body instead of nlimb rounds of 8 dynamic-slice ops.
    def round_(w, _):
        v = w[0]
        ti = v & MASK
        m = (ti * n0) & MASK
        mprod = m[None] * pbrd
        lo = mprod & MASK
        hi = mprod >> LIMB_BITS
        carry0 = (v >> LIMB_BITS) + ((ti + lo[0]) >> LIMB_BITS)
        w = (
            jnp.concatenate([w[1:], z1])
            + jnp.concatenate([lo[1:], z1, z1])
            + jnp.concatenate([hi, z1])
        )
        return w.at[0].add(carry0), None

    w, _ = jax.lax.scan(round_, cols, None, length=nlimb, unroll=carry_unroll())
    return _carry_canonical(w, spec)


def mont_reduce(a, spec: FieldSpec):
    """REDC by one factor: a * R^-1 mod p (i.e. mont_mul(a, 1))."""
    one = jnp.zeros_like(a)
    one = one.at[0].set(jnp.ones_like(a[0]))
    return mont_mul(a, one, spec)


def mont_pow_const(a, exponent: int, spec: FieldSpec):
    """a^exponent (Montgomery in/out) for a COMPILE-TIME exponent.

    Implemented as a lax.scan over the exponent bits (one mont_sqr +
    one selected mont_mul per step) so the compiled graph holds exactly
    TWO multiplier instances regardless of exponent size — the
    compile-friendly square-and-multiply."""
    nbits = exponent.bit_length()
    bits = jnp.asarray(
        [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
    )
    one = jnp.broadcast_to(
        jnp.asarray(spec.one_mont_limbs.reshape((spec.nlimb,) + (1,) * (a.ndim - 1)), U32),
        a.shape,
    )

    def body(acc, bit):
        sq = mont_mul(acc, acc, spec)
        withmul = mont_mul(sq, a, spec)
        return jnp.where(bit > 0, withmul, sq), None

    out, _ = jax.lax.scan(body, one, bits)
    return out


def mont_inv(a, spec: FieldSpec):
    """Batched modular inverse via Fermat: a^(p-2). Maps 0 -> 0."""
    return mont_pow_const(a, spec.modulus - 2, spec)


def batch_inv(a, spec: FieldSpec, _seq_limit: int = 512):
    """Montgomery's batch-inversion trick along the LAST axis.

    Hierarchical: the array is reshaped to (m, k) chunks, the two
    product scans run over k steps with m parallel lanes, and the m
    chunk totals are inverted recursively — sequential depth O(sqrt n)
    ... O(log) levels, instead of an n-step scan. One Fermat inversion
    total. Zero entries poison their chunk, so input must be nonzero
    (the affine-conversion caller masks infinities first)."""
    n = a.shape[-1]
    one_col = jnp.asarray(
        spec.one_mont_limbs.reshape((spec.nlimb,) + (1,) * (a.ndim - 1)), U32
    )
    if n <= _seq_limit:
        x = jnp.moveaxis(a, -1, 0)  # (n, 16, ...)

        def fwd(carry, v):
            nxt = mont_mul(carry, v, spec)
            return nxt, carry  # prefix EXCLUSIVE product

        one = jnp.broadcast_to(one_col[..., 0], a.shape[:-1])
        total, prefix_excl = jax.lax.scan(fwd, one, x)
        inv_total = mont_inv(total, spec)

        def bwd(carry, v):
            v_elem, pfx = v
            inv_elem = mont_mul(carry, pfx, spec)
            nxt = mont_mul(carry, v_elem, spec)
            return nxt, inv_elem

        _, invs = jax.lax.scan(bwd, inv_total, (x, prefix_excl), reverse=True)
        return jnp.moveaxis(invs, 0, -1)

    # hierarchical: pad to m*k, scan chunks of k in parallel
    k = _seq_limit
    pad = (-n) % k
    if pad:
        a = jnp.concatenate(
            [a, jnp.broadcast_to(one_col, a.shape[:-1] + (pad,))], axis=-1
        )
    m = (n + pad) // k
    resh = a.reshape(a.shape[:-1] + (m, k))
    x = jnp.moveaxis(resh, -1, 0)  # (k, 16, ..., m)

    def fwd(carry, v):
        nxt = mont_mul(carry, v, spec)
        return nxt, carry

    one = jnp.broadcast_to(one_col, resh.shape[:-1])
    totals, prefix_excl = jax.lax.scan(fwd, one, x)

    inv_totals = batch_inv(totals, spec, _seq_limit)  # (16, ..., m)

    def bwd(carry, v):
        v_elem, pfx = v
        inv_elem = mont_mul(carry, pfx, spec)
        nxt = mont_mul(carry, v_elem, spec)
        return nxt, inv_elem

    _, invs = jax.lax.scan(bwd, inv_totals, (x, prefix_excl), reverse=True)
    out = jnp.moveaxis(invs, 0, -1).reshape(a.shape)
    return out[..., :n]


def to_mont(a, spec: FieldSpec):
    """Standard form -> Montgomery form: a * R mod p."""
    r2 = jnp.asarray(spec.r2_limbs.reshape((spec.nlimb,) + (1,) * (a.ndim - 1)), dtype=U32)
    r2 = jnp.broadcast_to(r2, a.shape)
    return mont_mul(a, r2, spec)


def select(mask, a, b):
    """mask: (...) bool; a, b: (16, ...)."""
    return jnp.where(mask[None], a, b)


def const_limbs(v: int, shape=(), spec: FieldSpec | None = None) -> jnp.ndarray:
    """Broadcast a Python int to a (nlimb,) + shape limb array."""
    nlimb = spec.nlimb if spec is not None else NLIMB
    base = int_to_limbs_np(v, nlimb).reshape((nlimb,) + (1,) * len(shape))
    return jnp.broadcast_to(jnp.asarray(base, dtype=U32), (nlimb,) + tuple(shape))


# ------------------------------------------------------------- field specs

from ..refmath.field import Q as _Q, R_MOD as _R  # noqa: E402

FQ_SPEC = FieldSpec(modulus=_Q, name="bn254_fq")
FR_SPEC = FieldSpec(modulus=_R, name="bn254_fr")
