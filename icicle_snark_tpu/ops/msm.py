"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference's CUDA bucket method (split/sort/RLE/accumulate/
reduce, /root/reference/icicle/backend/cuda/src/msm/cuda_msm.cuh:959-1130)
with a sort + prefix-scan formulation that has no atomics and no
data-dependent control flow — the TPU-native shape of the same algorithm:

  1. window digits via limb shifts (get_scalar_digit analog,
     modular_arithmetic.h:274)
  2. per window: argsort points by digit (XLA sort = the cub radix-sort
     + RLE step)
  3. bucket sums WITHOUT scatter: hierarchical chunked inclusive
     prefix-scan of the sorted points (lax.scan over K steps of
     batched mixed adds -> work-optimal n EC adds, depth ~K*levels),
     then bucket_b = P[end_b-1] - P[start_b-1] — a prefix-difference.
     Complete RCB15 formulas make empty buckets (X - X = identity) and
     boundary indices fall out with zero special cases.
  4. window reduction Sum b*bucket_b via the suffix-sum identity
     (= the reference's triangle sum, big_triangle_sum_kernel) using the
     same prefix-scan machinery + a pairwise reduction tree.
  5. Horner over windows on host (254 doublings of a single point —
     latency-bound, so host Python ints are the right device).

Scalars are treated as raw limb INTEGERS (not field values): the Groth16
pipeline feeds standard-form witness values and Montgomery-carrying
h-values exactly like the reference does (see SURVEY.md section 3.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs as lb
from ..fields.limbs import NLIMB
from ..refmath import curve as rcv
from ..refmath.field import Q, fq_from_mont
from ..curve import jcurve as jc

SCALAR_BITS = 256


def choose_c(n: int) -> int:
    """Window size heuristic (the analog of the reference's decision
    trees / get_optimal_c): minimize 254/c*n + 5*2^c*254/c."""
    best_c, best_cost = 8, None
    for c in range(8, 17):
        windows = -(-SCALAR_BITS // c)
        cost = windows * (n + 5 * (1 << c))
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(16, n) uint32 16-bit limbs -> (n_windows, n) c-bit digits."""
    n_windows = -(-SCALAR_BITS // c)
    mask = np.uint32((1 << c) - 1)
    digits = []
    for w in range(n_windows):
        bit = w * c
        limb, off = bit // 16, bit % 16
        d = scalars[limb] >> np.uint32(off)
        if off + c > 16 and limb + 1 < NLIMB:
            d = d | (scalars[limb + 1] << np.uint32(16 - off))
        digits.append(d & mask)
    return jnp.stack(digits, axis=0)


# ------------------------------------------------------------------ scans

def _gather_last(arr, idx):
    """Gather along the last (batch) axis."""
    return jnp.take(arr, idx, axis=-1)


def _chunked_inclusive_scan(points, ops, k: int, mixed: bool):
    """Scan a (coords..., m*k) point batch in chunks of k.

    Returns (inclusive_prefix (coords..., m*k), chunk_totals (coords..., m)).
    Chunk j covers positions [j*k, (j+1)*k); lanes = chunks, steps = k.
    """
    first = points[0]
    width = first.shape[-1]
    m = width // k
    ncoord = len(ops.coord_shape)

    def to_steps(a):
        # (..., m*k) -> (k, ..., m): step-major for lax.scan
        a = a.reshape(a.shape[:-1] + (m, k))
        return jnp.moveaxis(a, -1, 0)

    xs = tuple(to_steps(a) for a in points)
    carry0 = jc.identity(ops, (m,))

    add = jc.pmadd if mixed else jc.padd

    def body(carry, x):
        new = add(ops, carry, x)
        return new, new

    totals, prefix_steps = jax.lax.scan(body, carry0, xs)

    def from_steps(a):
        a = jnp.moveaxis(a, 0, -1)  # (..., m, k)
        return a.reshape(a.shape[:-2] + (m * k,))

    inclusive = tuple(from_steps(a) for a in prefix_steps)
    return inclusive, totals


class PrefixTree:
    """Hierarchical inclusive prefix sums over a point sequence.

    levels[l] = inclusive within-chunk prefixes at level l, chunk size
    k_l elements of level l (level 0 elements are the input points).
    query(i) composes one gather+add per level: global inclusive
    prefix P_i for arbitrary (possibly -1 = 'empty') indices.
    """

    def __init__(self, points_affine, ops, k: int = 128):
        self.ops = ops
        self.ks = []
        self.levels = []

        width = points_affine[0].shape[-1]
        cur = points_affine
        mixed = True  # level 0 input is affine; higher levels projective
        while True:
            kl = min(k, width)
            pad = (-width) % kl
            if pad:
                if mixed:
                    # affine (0,0) is treated as the identity by pmadd
                    filler = tuple(jnp.zeros(a.shape[:-1] + (pad,), dtype=a.dtype) for a in cur)
                else:
                    filler = jc.identity(ops, (pad,))
                cur = tuple(jnp.concatenate([a, f], axis=-1) for a, f in zip(cur, filler))
                width += pad
            inclusive, totals = _chunked_inclusive_scan(cur, ops, kl, mixed)
            self.ks.append(kl)
            self.levels.append(inclusive)
            cur = totals
            width = width // kl
            mixed = False
            if width == 1:
                self.total = tuple(a[..., 0] for a in totals)
                break

    def query(self, idx: jnp.ndarray):
        """P_idx (inclusive, identity for idx < 0); idx: (...,) int32."""
        ops = self.ops
        acc = jc.identity(ops, idx.shape)
        i = idx
        valid = i >= 0
        for kl, incl in zip(self.ks, self.levels):
            safe = jnp.maximum(i, 0)
            contrib = tuple(_gather_last(a, safe) for a in incl)
            term = jc.pselect(ops, valid, contrib, jc.identity(ops, idx.shape))
            acc = jc.padd(ops, acc, term)
            i = (safe // kl) - 1
            valid = valid & (i >= 0)
        return acc


def _tree_reduce(points, ops):
    """Pairwise reduction of (coords..., m) -> single point (log depth)."""
    width = points[0].shape[-1]
    while width > 1:
        if width % 2:
            ident = jc.identity(ops, (1,))
            points = tuple(
                jnp.concatenate([a, jnp.broadcast_to(b, b.shape[:-1] + (1,))], axis=-1)
                for a, b in zip(points, ident)
            )
            width += 1
        lhs = tuple(a[..., 0::2] for a in points)
        rhs = tuple(a[..., 1::2] for a in points)
        points = jc.padd(ops, lhs, rhs)
        width //= 2
    return tuple(a[..., 0] for a in points)


# ------------------------------------------------------------------ windows

def _window_sum(points_affine, digits, ops, c: int, k: int):
    """Bucket-accumulate and reduce ONE window. digits: (n,) uint32."""
    n = digits.shape[0]
    n_buckets = 1 << c

    order = jnp.argsort(digits)
    d_sorted = digits[order]
    pts = tuple(_gather_last(a, order) for a in points_affine)

    tree = PrefixTree(pts, ops, k=k)

    bucket_ids = jnp.arange(n_buckets, dtype=digits.dtype)
    ends = jnp.searchsorted(d_sorted, bucket_ids, side="right").astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])

    p_end = tree.query(ends - 1)
    p_start = tree.query(starts - 1)
    buckets = jc.padd(ops, p_end, jc.pneg(ops, p_start))  # (coords..., B)

    # window value = sum_{b>=1} b * bucket_b = sum of suffix sums S_1..S_{B-1}
    rev = tuple(a[..., ::-1] for a in buckets)
    suffix_tree = PrefixTree(rev, ops, k=k)
    # level-0 inclusive prefixes of rev ARE partial suffix sums only within
    # chunks; we need the full prefix at every position -> query all.
    all_idx = jnp.arange(n_buckets - 1, dtype=jnp.int32)  # drop S_0 (last rev slot)
    suffix = suffix_tree.query(all_idx)
    return _tree_reduce(suffix, ops)


def msm_device(scalars, points_affine, ops, c: int, k: int = 128):
    """All window sums on device. scalars: (16, n) raw integer limbs.

    Returns window sums, a tuple of (coords..., n_windows) arrays.
    """
    digits = window_digits(scalars, c)  # (W, n)

    def body(_, d):
        return None, jc.point_stack(_window_sum(points_affine, d, ops, c, k))

    _, stacked = jax.lax.scan(body, None, digits)
    # stacked: (W, 3, coords...); -> tuple of 3 arrays (coords..., W)
    moved = jnp.moveaxis(stacked, 0, -1)
    return (moved[0], moved[1], moved[2])


def _limbs_to_fq(arr) -> int:
    return fq_from_mont(lb.limbs_to_ints_np(np.asarray(arr).reshape(NLIMB, 1))[0])


def _window_points_to_host_g1(wsums) -> list:
    xs, ys, zs = (np.asarray(a) for a in wsums)
    n_w = xs.shape[-1]
    out = []
    for w in range(n_w):
        p = (
            _limbs_to_fq(xs[:, w]),
            _limbs_to_fq(ys[:, w]),
            _limbs_to_fq(zs[:, w]),
        )
        out.append(p)
    return out


def _window_points_to_host_g2(wsums) -> list:
    xs, ys, zs = (np.asarray(a) for a in wsums)
    n_w = xs.shape[-1]
    out = []
    for w in range(n_w):
        p = (
            (_limbs_to_fq(xs[0, :, w]), _limbs_to_fq(xs[1, :, w])),
            (_limbs_to_fq(ys[0, :, w]), _limbs_to_fq(ys[1, :, w])),
            (_limbs_to_fq(zs[0, :, w]), _limbs_to_fq(zs[1, :, w])),
        )
        out.append(p)
    return out


def horner_combine(window_points, c: int, g2: bool = False):
    """result = sum_w 2^(c*w) * W_w via doubling-Horner (host, exact)."""
    if g2:
        dbl, add, zero = rcv.g2_dbl, rcv.g2_add, rcv.G2_ZERO
    else:
        dbl, add, zero = rcv.g1_dbl, rcv.g1_add, rcv.G1_ZERO
    acc = zero
    for p in reversed(window_points):
        for _ in range(c):
            acc = dbl(acc)
        acc = add(acc, p)
    return acc


def msm_g1(scalars, points_affine, c: int | None = None, k: int = 128):
    """Full G1 MSM. scalars (16,n) uint32 limbs (integer semantics),
    points (x, y) tuple of (16, n) Montgomery-form coordinate limbs.
    Returns a host projective point (ints, standard form)."""
    n = scalars.shape[-1]
    c = c or choose_c(n)
    wsums = _msm_g1_jit(scalars, points_affine, c, k)
    return horner_combine(_window_points_to_host_g1(wsums), c)


def msm_g2(scalars, points_affine, c: int | None = None, k: int = 128):
    n = scalars.shape[-1]
    c = c or choose_c(n)
    wsums = _msm_g2_jit(scalars, points_affine, c, k)
    return horner_combine(_window_points_to_host_g2(wsums), c, g2=True)


@partial(jax.jit, static_argnums=(2, 3))
def _msm_g1_jit(scalars, points_affine, c, k):
    return msm_device(scalars, points_affine, jc.FqOps, c, k)


@partial(jax.jit, static_argnums=(2, 3))
def _msm_g2_jit(scalars, points_affine, c, k):
    return msm_device(scalars, points_affine, jc.Fq2Ops, c, k)
