"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference's CUDA bucket method (split/sort/RLE/accumulate/
reduce, /root/reference/icicle/backend/cuda/src/msm/cuda_msm.cuh:959-1130)
with a sort + prefix-scan formulation that has no atomics and no
data-dependent control flow — the TPU-native shape of the same algorithm:

  1. window digits via limb shifts (get_scalar_digit analog,
     modular_arithmetic.h:274)
  2. per window: argsort points by (group, digit) key (XLA sort = the
     cub radix-sort + RLE step)
  3. bucket sums WITHOUT scatter: hierarchical chunked inclusive
     prefix-scan of the sorted points (lax.scan over k steps of
     batched mixed adds -> work-optimal n EC adds), then
     bucket_b = P[end_b-1] - P[start_b-1] — a prefix-difference.
     Complete RCB15 formulas make empty buckets and boundary indices
     fall out with zero special cases.
  4. window reduction sum_b b*bucket_b via suffix sums (= the
     reference's triangle sum) using the same prefix-scan machinery.
  5. Horner over windows on host (254 doublings of a single point —
     latency-bound, so host Python ints are the right device).

BATCHED GROUPS (the reference's batched-MSM mode, and the compile-time
crux): all four G1 MSMs of a Groth16 prove run as ONE pipeline over
group-concatenated lanes. Each element's sort key is
group_id * 2^c + digit, so groups stay contiguous after the sort and
the prefix-DIFFERENCE bucket extraction cancels cross-group content
exactly. One compiled instance, 4x the VPU lanes per op.

Scalars are raw limb INTEGERS (not field values): the Groth16 pipeline
feeds standard-form witness values and h-values exactly like the
reference does (see SURVEY.md section 3.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import serve_lean
from ..fields import limbs as lb
from ..fields.limbs import NLIMB
from ..refmath import curve as rcv
from ..refmath.field import Q, fq_from_mont
from ..curve import jcurve as jc

SCALAR_BITS = 256


import os as _os

# re-fit round 2 after the searchsorted->histogram fix shrank the
# bucket phase (v5e c-sweep at 4x2^16: best c=12; beta=6 reproduces it)
# Bucket-phase cost per bucket in EC-add lane-units. Recalibrated in
# round 5 after the sort-payload reorder cheapened the per-window fixed
# costs: the 431k-lane c sweep measured c11/12/13/14 = 905/857/821/886
# ms (tools/msm_c_sweep.py), and beta=4 reproduces those ratios within
# ~1% and picks the measured-optimal c=13 (beta=6, calibrated round 2
# pre-reorder, picked c=12). G2's measured-optimal (13, 4) plan is
# unchanged under beta=4.
MSM_BETA = float(_os.environ.get("ISTPU_MSM_BETA", "4"))


def choose_c(n: int, groups: int = 1) -> int:
    """Window size heuristic (the analog of the reference's decision
    trees / get_optimal_c): minimize windows * (total + beta * G *
    2^(c-1)) for signed buckets, where `n` is the TOTAL concatenated
    lane count across the batched groups (the chunk scan runs over all
    of them each window) and the bucket phase costs ~beta EC-add
    lane-units per bucket (telescoped query + reduce; beta measured on
    v5e, override via ISTPU_MSM_BETA)."""
    best_c, best_cost = 8, None
    for c in range(8, 17):
        windows = -(-SCALAR_BITS // c)
        cost = windows * (n + MSM_BETA * groups * (1 << (c - 1)))
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


# HBM budget for precomputed base copies (both G1 + G2 pools together
# stay well under half the 16 GB chip so NTT transients + MSM slice
# working sets keep headroom)
MSM_PRE_BUDGET = int(
    float(_os.environ.get("ISTPU_MSM_PRE_BUDGET_MB", "6144")) * (1 << 20)
)
# v5e sweeps (tools/msm_k_sweep.py, 4x2^16): f=8 lost to f=4 at every c
# (window-slot padding waste + superlinear per-window costs at 2M+
# lanes/window); f=4 at c=13 was the optimum. Cap at 4.
MSM_PRE_MAX = int(_os.environ.get("ISTPU_MSM_PRE_MAX", "4"))
# ... and the f>1 payoff does NOT extrapolate with scalar count: at
# 262k total scalars c13f4 beat c12f1 by 8% (513 vs 554 ms), but at the
# real 431k-scalar 100k-prove shape every f>1 config LOST to c12f1
# (908 ms vs 939 c13f2 / 1025 c13f4 — tools/prove_profile.py +
# msm_k_sweep n=107776), with no clean per-window lanes/bytes knee to
# model it. Until the superlinear term is understood, precompute is
# gated on measured-win territory: in-core MSMs up to ~300k scalars.
MSM_PRE_N_KNEE = int(_os.environ.get("ISTPU_MSM_PRE_N_KNEE", "300000"))


def choose_c_pre(n: int, groups: int = 1, g2: bool = False,
                 budget_bytes: int | None = None,
                 max_lanes: int | None = None):
    """Joint (window size, precompute factor) for FIXED bases (the
    proving key): scan work is slots(c, f) * n lane-adds (slots = merged
    window count x f, i.e. windows rounded UP to a multiple of f — dead
    slots still ride the sort/gather/scan), so precompute's value is
    cutting the per-MERGED-window bucket cost (query + telescope,
    ~beta * G * 2^(c-1) lane-adds per merged window PER SLICE when out
    of core). Factor capped by the HBM budget for the base copies and
    by the measured f<=4 cliff (reference analog: precompute_factor +
    get_optimal_c, msm/mod.rs:175-190, cpu_msm.hpp:76-158)."""
    budget = MSM_PRE_BUDGET if budget_bytes is None else budget_bytes
    if n < (1 << 16) or budget <= 0:
        # tiny MSMs (tests, dryrun fixtures): copies would only grow the
        # traced graphs for negligible runtime — keep the plain layout
        return choose_c(n, groups), 1
    bytes_lane = 256 if g2 else 128  # affine u32 limb arrays per copy
    cap = max_lanes or (MSM_MAX_LANES // 2 if g2 else MSM_MAX_LANES)
    f_max = max(1, min(MSM_PRE_MAX, budget // max(1, bytes_lane * n)))
    if n > MSM_PRE_N_KNEE:
        # beyond the measured f>1 payoff range (see MSM_PRE_N_KNEE) and
        # into the out-of-core regime where sliced f>1 is unvalidated.
        # (The round-3 "kernel fault at 1.6M" is DIAGNOSED and fixed:
        # an XLA:TPU backend bug on unaligned Fq2 fori-loop chains —
        # precompute_bases now pads lanes to 256. This gate is purely
        # the measured perf knee now.)
        f_max = 1
    best, best_cost = (choose_c(n, groups), 1), None
    for c in range(10, 17):
        w_total = -(-SCALAR_BITS // c)
        for f in (1, 2, 4):
            if f > f_max or f > w_total:
                continue
            wp = -(-w_total // f)
            slots = wp * f
            n_slices = max(1, -(-(n * f) // cap))
            cost = slots * n + MSM_BETA * groups * (1 << (c - 1)) * wp * n_slices
            if best_cost is None or cost < best_cost:
                best, best_cost = (c, f), cost
    return best


def window_digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """(nlimb, n) uint32 16-bit limbs -> (n_windows, n) c-bit digits.

    Scalar bit-width derives from the limb count (16 limbs = 256 bits
    for BN254; wider scalar fields get proportionally more windows)."""
    nlimb = scalars.shape[0]
    scalar_bits = 16 * nlimb
    n_windows = -(-scalar_bits // c)
    mask = np.uint32((1 << c) - 1)
    digits = []
    for w in range(n_windows):
        bit = w * c
        limb, off = bit // 16, bit % 16
        d = scalars[limb] >> np.uint32(off)
        if off + c > 16 and limb + 1 < nlimb:
            d = d | (scalars[limb + 1] << np.uint32(16 - off))
        digits.append(d & mask)
    return jnp.stack(digits, axis=0)


def window_digits_signed(scalars: jnp.ndarray, c: int):
    """Balanced (signed) window digits: values in [-(2^(c-1)), 2^(c-1)].

    Returns (abs_digits (W, n) uint32 in [0, 2^(c-1)], neg (W, n) bool).
    Halves the bucket space vs unsigned windows (the reference's CUDA
    MSM uses the same signed-bucket trick, cuda_msm.cuh
    split_scalars_kernel). BN254 scalars are < 2^254, so for c >= 8 the
    top window's digit stays below 2^(c-1) and the carry never
    overflows out.
    """
    raw = window_digits(scalars, c)
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    outs_abs, outs_neg = [], []
    carry = jnp.zeros_like(raw[0])
    for w in range(raw.shape[0]):
        d = raw[w] + carry
        neg = d > half
        carry = neg.astype(jnp.uint32)
        outs_abs.append(jnp.where(neg, full - d, d))
        outs_neg.append(neg)
    return jnp.stack(outs_abs), jnp.stack(outs_neg)


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

    def to_steps(a):
        # (..., m*k) -> (k, ..., m): step-major for lax.scan
        a = a.reshape(a.shape[:-1] + (m, k))
        return jnp.moveaxis(a, -1, 0)

    xs = tuple(to_steps(a) for a in points)
    carry0 = jc.identity(ops, points[0].shape[len(ops.coord_shape):-1] + (m,))

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


def _pack_rows(points):
    """Point coordinate tuple (each (coords..., n)) -> row-major PACKED
    payload (n, R/2) u32: two 16-bit limbs per word. Canonical limbs
    are < 2^16, so the top halves of the u32 lanes are dead freight —
    packing halves the bytes every row gather moves."""
    rows = jnp.concatenate([a.reshape(-1, a.shape[-1]) for a in points], axis=0)
    return jnp.transpose(rows[0::2] | (rows[1::2] << np.uint32(16)))


def _unpack_rows(g_rows, shapes):
    """(q, R/2) packed row gather output -> tuple of (coords..., q)
    arrays with the given shapes (last dim replaced by q)."""
    g_rows = jnp.transpose(g_rows)  # (R/2, q)
    mask16 = np.uint32(0xFFFF)
    out, pos = [], 0
    q = g_rows.shape[-1]
    for shp in shapes:
        nr = int(np.prod(shp[:-1]))
        blk = g_rows[pos : pos + nr // 2]
        un = jnp.stack([blk & mask16, blk >> np.uint32(16)], axis=1)
        out.append(un.reshape((nr,) + blk.shape[1:]).reshape(shp[:-1] + (q,)))
        pos += nr // 2
    return tuple(out)


class PrefixTree:
    """Hierarchical inclusive prefix sums over a point sequence.

    Levels are stored as PACKED ROW-MAJOR payloads ((n, R/2) u32, see
    _pack_rows): query() then gathers boundary prefixes as row gathers,
    which run ~40x faster than lane-axis gathers of the limb-major
    layout (v5e: the lane-axis query gathers of the level-0 prefix were
    ~200 ms of a 555 ms 4x2^16 MSM — the whole telescope budget).
    query(i) composes one row-gather+add per level: global inclusive
    prefix P_i for arbitrary (possibly -1 = 'empty') indices.
    Batch dims are not supported (the MSM pipeline never has them).
    """

    def __init__(self, points, ops, k: int = 32, affine: bool = True):
        self.ops = ops
        self.ks = []
        self.levels = []  # packed (n_l, R/2) row payloads per level
        self.shapes = []  # unpacked coordinate shapes per level

        assert points[0].ndim == len(ops.coord_shape) + 1, (
            "PrefixTree: batch dims unsupported (pack/unpack is flat)"
        )
        width = points[0].shape[-1]
        cur = points
        mixed = affine  # level 0 may be affine; higher levels projective
        while True:
            kl = min(k, width)
            pad = (-width) % kl
            if pad:
                if mixed:
                    # affine (0,0) is treated as the identity by pmadd
                    filler = tuple(jnp.zeros(a.shape[:-1] + (pad,), dtype=a.dtype) for a in cur)
                else:
                    filler = jc.identity(ops, (pad,))
                cur = tuple(jnp.concatenate([a, jnp.broadcast_to(f, a.shape[:-1] + (pad,))], axis=-1) for a, f in zip(cur, filler))
                width += pad
            inclusive, totals = _chunked_inclusive_scan(cur, ops, kl, mixed)
            self.ks.append(kl)
            self.levels.append(_pack_rows(inclusive))
            self.shapes.append(tuple(a.shape for a in inclusive))
            cur = totals
            width = width // kl
            mixed = False
            if width == 1:
                self.total = tuple(a[..., 0] for a in totals)
                break

    def query(self, idx: jnp.ndarray):
        """P_idx (inclusive, identity for idx < 0); idx: (...,) int32.

        Sequential per-level gather+padd. A log-depth variant (all level
        gathers up-front — the index chain i_{l+1} = i_l // k_l - 1 is
        data-independent — then wide roll-reduced padds) was measured
        SLOWER on v5e (+54..116 ms at 4x2^16: the chip is throughput-
        bound here and the pow2-padded reduce does ~5x the lane work),
        so the L sequential q-lane padds stay. The level-0 contribution
        seeds the accumulator directly (its pselect identity fallback
        covers idx < 0), saving one padd per window."""
        ops = self.ops
        ident = jc.identity(ops, idx.shape)
        acc = None
        i = idx
        valid = i >= 0
        for kl, packed, shapes in zip(self.ks, self.levels, self.shapes):
            safe = jnp.maximum(i, 0)
            flat = safe.reshape(-1)
            g_rows = jnp.take(packed, flat, axis=0)  # (q, R/2) row gather
            contrib = tuple(
                a.reshape(a.shape[:-1] + safe.shape)
                for a in _unpack_rows(g_rows, [s[:-1] + (flat.shape[0],) for s in shapes])
            )
            term = jc.pselect(ops, valid, contrib, ident)
            acc = term if acc is None else jc.padd(ops, acc, term)
            i = (safe // kl) - 1
            valid = valid & (i >= 0)
        return acc


def _roll_reduce(points, ops):
    """Sum of the last axis -> (coords...,), via log2 rounds of
    padd(x, roll(x, -2^i)) inside ONE fori_loop (one compiled padd
    instance regardless of width — the compile-time replacement for a
    shape-halving tree). Lane 0's dependency cone never crosses the
    wrap-around, so no masking is needed; order is fixed ->
    deterministic results."""
    width = points[0].shape[-1]
    pad = (1 << max(width - 1, 1).bit_length()) - width if width & (width - 1) else 0
    if pad:
        ncoord = len(ops.coord_shape)
        ident = jc.identity(ops, points[0].shape[ncoord:-1] + (pad,))
        points = tuple(
            jnp.concatenate([a, jnp.broadcast_to(b, a.shape[:-1] + (pad,))], axis=-1)
            for a, b in zip(points, ident)
        )
        width += pad
    log_w = width.bit_length() - 1
    if log_w == 0:
        return tuple(a[..., 0] for a in points)

    stacked = jc.point_stack(points)

    def body(i, pts):
        shift = jax.lax.shift_left(1, i)
        rolled = jnp.roll(pts, -shift, axis=-1)
        new = jc.padd(ops, jc.point_unstack(pts), jc.point_unstack(rolled))
        return jc.point_stack(new)

    out = jax.lax.fori_loop(0, log_w, body, stacked)
    return tuple(a[..., 0] for a in jc.point_unstack(out))


def _chunked_reduce(points, ops, k: int = 32):
    """Work-optimal sum along the last axis -> (coords..., ...batch).

    Chunked sequential scans (k padds over width/k lanes per level)
    instead of Hillis-Steele: ~1.05*width total padd-lane-units vs
    width*log2(width). Falls back to _roll_reduce for small widths
    where sequential-step latency would dominate."""
    width = points[0].shape[-1]
    while width > 64:
        kl = min(k, width)
        pad = (-width) % kl
        if pad:
            ncoord = len(ops.coord_shape)
            ident = jc.identity(ops, points[0].shape[ncoord:-1] + (pad,))
            points = tuple(
                jnp.concatenate([a, jnp.broadcast_to(b, a.shape[:-1] + (pad,))], axis=-1)
                for a, b in zip(points, ident)
            )
            width += pad
        _, totals = _chunked_inclusive_scan(points, ops, kl, mixed=False)
        points = totals
        width = width // kl
    return _roll_reduce(points, ops)


def _scalar_double_k(point, ops, times: int):
    """2^times * point via `times` doublings — ONE pdbl instance inside
    a fori_loop (the unrolled chain was a major share of the traced
    graph: c-1 doublings x ~14 mont_muls each, per MSM pipeline)."""
    if times == 0:
        return point
    stacked = jc.point_stack(point)

    def body(_, s):
        return jc.point_stack(jc.pdbl(ops, jc.point_unstack(s)))

    return jc.point_unstack(jax.lax.fori_loop(0, times, body, stacked))


# kept for the cross-device combine in parallel/msm_shard.py
def _tree_reduce(points, ops):
    return _roll_reduce(points, ops)


# ------------------------------------------------------------------ precompute

def to_affine_device(proj, ops):
    """Projective device points -> affine (x, y), infinity -> (0, 0).

    Batch-inverts z (Montgomery trick) — one-time cost, used by base
    precompute (the analog of the reference's msm_precompute_bases,
    icicle/src/msm.cpp:30-73)."""
    x, y, z = proj
    inf = ops.is_zero_lanes(z)
    zsafe = jc.pselect_field(ops, inf, ops.one_like(z), z)
    zi = ops.inv(zsafe)
    ax, ay = ops.mul_many([(x, zi), (y, zi)])
    zero = jnp.zeros_like(ax)
    ax = jc.pselect_field(ops, inf, zero, ax)
    ay = jc.pselect_field(ops, inf, zero, ay)
    return ax, ay


def precompute_bases(points_affine, ops, c: int, factor: int,
                     scalar_bits: int = 16 * NLIMB):
    """Precompute-factor bases: interleaved affine copies
    [P, 2^(c*Wp)P, ..., 2^((factor-1)*c*Wp)P] with lane layout
    i*factor + m = copy m of point i, so an out-of-core slice of
    scalars [s0:s1] maps to the contiguous point rows
    [factor*s0 : factor*s1].

    Mirrors the reference's precompute_bases + precompute_factor
    (wrappers/rust/icicle-core/src/msm/mod.rs:175-190, shifted copies
    2^{lc}*P per cuda_msm.cuh precompute kernel).

    The doubling chain runs CHUNKED (lax.map over <= 2^19-lane slices,
    infinity-padded to a chunk multiple): the XLA:TPU backend
    kernel-faults (worker crash, not OOM — reproduced with only the
    input resident) on wide fori_loop Fq2 (16, 2, N) point-doubling
    graphs. Bisected round 4 (tools/dbl_chain_repro.py, ROADMAP):
    unaligned N crashes from ~7e5 (786,433 yes / 600,003 no), and
    even 256/512/1024/16384-aligned N crash from ~1.6e6 (1,600,512
    yes / 1,599,488 no) while pow2-ish 1,572,864 is fine; the G1
    (16, N) layout is unaffected at identical sizes. The round-3
    'points_h crash' was this bug, mis-attributed by async dispatch.
    Chunking bounds every fused chain far below the crash region and
    is exact (infinity pad lanes are dropped by the final slice)."""
    if factor == 1:
        return points_affine
    x, y = points_affine
    n_real = x.shape[-1]
    w_total = -(-scalar_bits // c)
    wp = -(-w_total // factor)
    shift = c * wp

    inf = ops.is_zero_lanes(x) & ops.is_zero_lanes(y)
    z = jc.pselect_field(ops, inf, jnp.zeros_like(x), ops.one_like(x))
    copies = [(x, y)]
    cur = (x, y, z)

    chunk = 1 << 19

    def dbl_k(p, k):
        stacked = jc.point_stack(p)  # (3, coords..., n)
        n = stacked.shape[-1]

        def body(_, s):
            return jc.point_stack(jc.pdbl(ops, jc.point_unstack(s)))

        if n <= chunk:
            return jc.point_unstack(jax.lax.fori_loop(0, k, body, stacked))
        # chunked: bound every fused chain below the backend crash
        # region (see docstring); pad lanes with zeros (projective
        # (0,0,0) doubles to itself harmlessly) and slice back
        nch = -(-n // chunk)
        pad = nch * chunk - n
        if pad:
            stacked = jnp.concatenate(
                [stacked, jnp.zeros(stacked.shape[:-1] + (pad,), stacked.dtype)],
                axis=-1,
            )
        st = jnp.moveaxis(
            stacked.reshape(stacked.shape[:-1] + (nch, chunk)), -2, 0
        )  # (nch, 3, coords..., chunk)

        def one_chunk(cstate):
            return jax.lax.fori_loop(0, k, body, cstate)

        out = jax.lax.map(one_chunk, st)
        out = jnp.moveaxis(out, 0, -2).reshape(
            stacked.shape[:-1] + (nch * chunk,)
        )[..., :n]
        return jc.point_unstack(out)

    for _ in range(factor - 1):
        cur = dbl_k(cur, shift)
        copies.append(to_affine_device(cur, ops))
        cur = None  # re-lift from the affine copy: keeps z == 1 exact
        ax, ay = copies[-1]
        z = jc.pselect_field(ops, inf, jnp.zeros_like(ax), ops.one_like(ax))
        cur = (ax, ay, z)

    outs = []
    for i in range(2):
        arr = jnp.stack([cp[i] for cp in copies], axis=-1)  # (..., n, p)
        flat = arr.reshape(arr.shape[:-2] + (arr.shape[-2] * arr.shape[-1],))
        # drop the alignment padding: interleaved layout puts padded
        # points' copies at lanes >= n_real * factor
        outs.append(flat[..., : n_real * factor])
    return tuple(outs)


def precompute_bases_host(points_affine, c: int, factor: int,
                          g2: bool = False, scalar_bits: int = 16 * NLIMB):
    """Numpy/refmath oracle of `precompute_bases` — bit-identical layout
    and encoding, computed with host bigints (no XLA modules).

    Used by the driver dryrun (tiny fixtures must not pay doubling-chain
    compiles) and as the differential oracle in tests. points_affine:
    G1 (x, y) each (16, n) Montgomery limbs, or G2 each (16, 2, n)."""
    if factor == 1:
        return points_affine
    from ..refmath.field import fq_to_mont

    w_total = -(-scalar_bits // c)
    wp = -(-w_total // factor)
    shift = c * wp

    x, y = (np.asarray(a) for a in points_affine)
    n = x.shape[-1]

    def col_ints(arr):  # (16, n) Montgomery limbs -> list of standard ints
        return [fq_from_mont(v) for v in lb.limbs_to_ints_np(arr)]

    if not g2:
        xs, ys = col_ints(x), col_ints(y)
        base = [
            None if (xi == 0 and yi == 0) else (xi, yi)
            for xi, yi in zip(xs, ys)
        ]
        copies = [base]
        for _ in range(factor - 1):
            copies.append([
                None if p is None
                else rcv.g1_to_affine(rcv.g1_mul(rcv.g1_from_affine(p), 1 << shift))
                for p in copies[-1]
            ])
        # interleave: copy m of point i at lane i*factor + m
        out = []
        for coord in range(2):
            vals = np.empty((NLIMB, n * factor), np.uint32)
            for m, cp in enumerate(copies):
                col = lb.ints_to_limbs_np(
                    [0 if p is None else fq_to_mont(p[coord]) for p in cp]
                )
                vals[:, m::factor] = col
            out.append(vals)
        return tuple(out)

    # G2: coords (16, 2, n) Fq2 limb stacks
    x0, x1 = col_ints(x[:, 0]), col_ints(x[:, 1])
    y0, y1 = col_ints(y[:, 0]), col_ints(y[:, 1])
    base = []
    for i in range(n):
        pt = ((x0[i], x1[i]), (y0[i], y1[i]))
        base.append(None if pt == ((0, 0), (0, 0)) else pt)
    copies = [base]
    for _ in range(factor - 1):
        copies.append([
            None if p is None
            else rcv.g2_to_affine(rcv.g2_mul(rcv.g2_from_affine(p), 1 << shift))
            for p in copies[-1]
        ])
    out = []
    for coord in range(2):
        vals = np.empty((NLIMB, 2, n * factor), np.uint32)
        for m, cp in enumerate(copies):
            for comp in range(2):
                col = lb.ints_to_limbs_np([
                    0 if p is None else fq_to_mont(p[coord][comp]) for p in cp
                ])
                vals[:, comp, m::factor] = col
        out.append(vals)
    return tuple(out)


def _merge_digit_windows(arr, factor: int, wp: int, fill):
    """(W, n) per-window rows -> (wp, n*factor) merged rows where merged
    window j lane i*factor+m = arr[j + m*wp, i]."""
    w, n = arr.shape
    pad = wp * factor - w
    if pad:
        filler = jnp.full((pad, n), fill, arr.dtype)
        arr = jnp.concatenate([arr, filler], axis=0)
    a = arr.reshape(factor, wp, n)          # [m, j, i]
    a = jnp.transpose(a, (1, 2, 0))          # [j, i, m]
    return a.reshape(wp, n * factor)


# ------------------------------------------------------------------ batched core

def _window_bucket_prefixes(points, rows_t, keys_w, neg_w, ops, c: int,
                            n_groups: int, k: int, signed: bool,
                            sort_payload: bool = False):
    """Bucket-boundary prefixes for ONE window, all groups at once.

    points: group-concatenated (+pad) point arrays, (coords..., total).
    keys_w: (total,) int32 sort keys  group_id*B + |digit|  (pad lanes
            carry the sentinel key n_groups*B, sorting to the end).
    neg_w:  (total,) bool digit signs (signed mode) or None.
    Returns P_end boundary prefixes, (coords..., n_groups, n_buckets) —
    the telescoped window reduction itself runs BATCHED across all
    windows in _windows_pipeline (running it per window put ~100
    near-empty sequential scan steps inside every window iteration).
    """
    n_buckets = (1 << (c - 1)) + 1 if signed else 1 << c

    # Reorder points into bucket order: argsort of the (digit-sign-
    # tagged) key, then ONE row-major gather of the combined coordinate
    # payload. Measured on v5e (tools/gather_microbench.py): lane-axis
    # gathers of limb-major arrays run ~4.6 GB/s while row gathers of
    # a (n, R) layout + transpose back run ~2x faster; the (R, n) ->
    # (n, R) transpose of the payload is hoisted OUT of the window loop
    # (rows_t is per-MSM constant). A 33-operand variadic lax.sort
    # moved payload 6x faster still, but its XLA compile blows up
    # (>10 min at 2^16 lanes) — not worth it.
    # The payload rides PACKED (2 x 16-bit limbs per u32 word, done once
    # per pipeline in _windows_pipeline): canonical limbs are < 2^16, so
    # the top halves of the u32 lanes are dead freight — packing halves
    # the gather + transpose bytes of the bandwidth-bound reorder.
    total = points[0].shape[-1]
    key2 = keys_w * jnp.int32(2)
    if signed:
        key2 = key2 + neg_w.astype(jnp.int32)
    if sort_payload:
        # SORT-PAYLOAD reorder (round 5, default): rows_t is the PACKED
        # COLUMN view (R/2, total) — carry the packed payload through
        # ONE variadic stable sort instead of argsort + row gather +
        # transpose + unpack. Measured on v5e (tools/gather_microbench):
        # the 17-operand sort moves key+payload in ~1.1 ms at 2^18 rows
        # where argsort (1.1) + packed row gather + transpose + unpack
        # (4.4) cost 5.5 ms — the gather/transpose phase disappears and
        # unpacking sorted COLUMNS is elementwise (no lane transpose).
        # Same stable order as argsort -> bit-identical downstream.
        sorted_ops = jax.lax.sort(
            [key2] + [rows_t[i] for i in range(rows_t.shape[0])], num_keys=1
        )
        key_sorted = sorted_ops[0]
        sp = jnp.stack(sorted_ops[1:], axis=0)          # (R/2, total)
        rows_sorted = jnp.stack(
            [sp & np.uint32(0xFFFF), sp >> np.uint32(16)], axis=1
        ).reshape(2 * sp.shape[0], total)               # (R, total)
        pts, pos = [], 0
        for a in points:
            nr = int(np.prod(a.shape[:-1]))
            pts.append(rows_sorted[pos : pos + nr].reshape(a.shape))
            pos += nr
        pts = tuple(pts)
    else:
        order = jnp.argsort(key2)
        key_sorted = key2[order]
        gathered = jnp.take(rows_t, order, axis=0)  # (total, R/2) row gather
        pts = _unpack_rows(gathered, [a.shape for a in points])
    k_sorted = key_sorted >> 1
    if signed:
        neg = (key_sorted & 1).astype(bool)
        # negate sorted y where the digit is negative
        x, y = pts
        y = jc.pselect_field(ops, neg, ops.neg(y), y)
        pts = (x, y)

    tree = PrefixTree(pts, ops, k=k)

    # Telescoped triangle sum (Abel summation against the prefix tree):
    # with P_b := global inclusive prefix at the END of bucket (g, b),
    #   window_g = sum_b b * (P_{g,b} - P_{g,b-1})
    #           = (B-1) * P_{g,B-1}  -  sum_{b<B-1} P_{g,b}.
    # One boundary query per bucket, one plain reduce — no start
    # queries, no bucket differences, no O(B log B) suffix scans.
    # Cross-group terms cancel exactly (the b=0 coefficient is zero).
    # bucket end positions: ends[b] = #keys <= b. A searchsorted here
    # measured 4.1 ms/window on v5e (dominating the whole bucket
    # phase); histogram + cumsum does the same in ~0.1 ms.
    gb = n_groups * n_buckets
    counts = jax.ops.segment_sum(
        jnp.ones_like(k_sorted, dtype=jnp.int32), k_sorted,
        num_segments=gb + 1, indices_are_sorted=True,
    )
    ends = jnp.cumsum(counts[:gb]).astype(jnp.int32)
    p_end = tree.query(ends - 1)  # (coords..., G*B)
    return tuple(a.reshape(a.shape[:-1] + (n_groups, n_buckets)) for a in p_end)


def _telescope_batched(p_end, ops, c: int, k: int, signed: bool):
    """Telescoped triangle sums for ALL windows at once.

    p_end: tuple of (coords..., W, G, B) boundary prefixes. With
    P_b := inclusive prefix at the END of bucket (g, b),
      window_g = sum_b b * (P_{g,b} - P_{g,b-1})
              = (B-1) * P_{g,B-1}  -  sum_{b<B-1} P_{g,b}
    (Abel summation; cross-group terms cancel exactly since the b=0
    coefficient is zero). One bucket-axis reduce and one doubling chain
    over a (W, G) batch — the same addition tree per (window, group)
    lane as the old per-window form, so results are bit-exact equal.
    Returns (coords..., W, G)."""
    n_buckets = p_end[0].shape[-1]
    last = tuple(a[..., n_buckets - 1] for a in p_end)  # (coords..., W, G)
    rest = tuple(a[..., : n_buckets - 1] for a in p_end)
    sum_rest = _chunked_reduce(rest, ops, k=k)

    # (B-1) * last: B-1 = 2^(c-1) signed (c-1 doublings), 2^c - 1
    # unsigned (c doublings minus one add of `last`)
    if signed:
        scaled = _scalar_double_k(last, ops, c - 1)
    else:
        scaled = jc.padd(ops, _scalar_double_k(last, ops, c), jc.pneg(ops, last))
    return jc.padd(ops, scaled, jc.pneg(ops, sum_rest))


def msm_device_grouped(scalar_groups, point_groups, ops, c: int, k: int = 32,
                       signed: bool = True, precompute: int = 1):
    """All window sums for a LIST of (scalars, points) groups sharing
    one compiled pipeline. scalars: (16, n_g) raw integer limbs; points:
    affine coordinate tuples (coords..., n_g).

    Returns window sums as ONE stacked array (3,) + coords + (G,
    n_windows): a single output buffer means the host readback is a
    single D2H transfer (one tunnel RTT) instead of three — the role of
    the reference's batched copy_to_host_async (proof_helper.rs:214-235).
    """
    n_groups = len(scalar_groups)
    p = precompute
    n_buckets = (1 << (c - 1)) + 1 if signed else 1 << c
    sizes = [p * s.shape[-1] for s in scalar_groups]
    total = sum(sizes)
    pad = (-total) % k
    scalar_bits = 16 * scalar_groups[0].shape[0]
    w_total = -(-scalar_bits // c)
    wp = -(-w_total // p)  # merged window count

    def merge(arr, fill):
        return _merge_digit_windows(arr, p, wp, fill) if p > 1 else arr

    if signed:
        dn = [window_digits_signed(s, c) for s in scalar_groups]
        digs = [merge(d, 0) for d, _ in dn]
        negs = jnp.concatenate([merge(ng, False) for _, ng in dn], axis=-1)
        if pad:
            negs = jnp.concatenate(
                [negs, jnp.zeros((negs.shape[0], pad), bool)], axis=-1
            )
    else:
        digs = [merge(window_digits(s, c), 0) for s in scalar_groups]
        negs = None
    keys = [
        d.astype(jnp.int32) + np.int32(g * n_buckets) for g, d in enumerate(digs)
    ]
    keys = jnp.concatenate(keys, axis=-1)
    if pad:
        sentinel = jnp.full((keys.shape[0], pad), n_groups * n_buckets, jnp.int32)
        keys = jnp.concatenate([keys, sentinel], axis=-1)

    for s, pg in zip(scalar_groups, point_groups):
        assert pg[0].shape[-1] == p * s.shape[-1], (
            f"point width {pg[0].shape[-1]} != precompute {p} x scalars {s.shape[-1]}"
        )
    ncoords = len(point_groups[0])
    points = []
    for i in range(ncoords):
        arrs = [pg[i] for pg in point_groups]
        cat = jnp.concatenate(arrs, axis=-1)
        if pad:
            # (0,0) encodes infinity; pad lanes sort last and are only
            # touched by prefix sums where they add the identity
            cat = jnp.concatenate(
                [cat, jnp.zeros(cat.shape[:-1] + (pad,), cat.dtype)], axis=-1
            )
        points.append(cat)
    points = tuple(points)
    return _windows_pipeline(points, keys, negs, ops, c, k, n_groups, signed)


def _windows_pipeline(points, keys, negs, ops, c, k, n_groups, signed):
    """Scan all windows: points (coords..., total), keys (W, total),
    negs (W, total) bool or None -> stacked (3, coords..., G, W).

    The per-window scan body stops at the bucket-boundary prefixes;
    the telescoped reductions run once, batched over (W, G)."""
    # PACKED payload view for the per-window reorder, built ONCE.
    # sort-payload mode (default): packed COLUMNS (R/2, total), carried
    # through the per-window variadic sort — no transpose anywhere.
    # gather mode (ISTPU_SORT_PAYLOAD=0): packed ROWS (total, R/2) for
    # the argsort + row-gather reorder (_pack_rows).
    # Narrow payloads only (BN254 G1 affine: 16 packed columns + key).
    # The G2-class pipelines keep the argsort + row-gather reorder:
    # both the single 33-operand sort AND a chunked pair of 17-operand
    # sorts compile pathologically on XLA:TPU at the prove shape
    # (measured: 1252 s vs the gather path's 163 s for the full G2
    # module — an +18 min first-prove tax for a ~100 ms-class runtime
    # win; ISTPU_SORT_PAYLOAD=force overrides for probes).
    n_rows = sum(int(np.prod(a.shape[:-1])) for a in points)
    _sp_env = _os.environ.get("ISTPU_SORT_PAYLOAD", "1")
    sort_payload = _sp_env == "force" or (
        _sp_env == "1" and n_rows // 2 <= 16
    )
    if sort_payload:
        rows = jnp.concatenate(
            [a.reshape(-1, a.shape[-1]) for a in points], axis=0)
        rows_t = rows[0::2] | (rows[1::2] << np.uint32(16))  # (R/2, total)
    else:
        rows_t = _pack_rows(points)
    ncoord = len(ops.coord_shape)

    if signed:
        def body(_, kw):
            keys_w, neg_w = kw
            pe = _window_bucket_prefixes(
                points, rows_t, keys_w, neg_w, ops, c, n_groups, k, True,
                sort_payload)
            return None, jc.point_stack(pe)

        _, stacked = jax.lax.scan(body, None, (keys, negs))
    else:
        def body(_, keys_w):
            pe = _window_bucket_prefixes(
                points, rows_t, keys_w, None, ops, c, n_groups, k, False,
                sort_payload)
            return None, jc.point_stack(pe)

        _, stacked = jax.lax.scan(body, None, keys)
    # stacked: (W, 3, coords..., G, B) -> per-coord (coords..., W, G, B)
    p_end = tuple(
        jnp.moveaxis(stacked[:, i], 0, ncoord) for i in range(3)
    )
    ws = _telescope_batched(p_end, ops, c, k, signed)  # (coords..., W, G)
    return jc.point_stack(tuple(jnp.swapaxes(a, -1, -2) for a in ws))


def msm_device_grouped_sliced(scalars, group_ids, points, ops, c: int,
                              k: int, n_groups: int, signed: bool = True,
                              precompute: int = 1):
    """One fixed-shape slice of a group-CONCATENATED MSM.

    scalars (16, L) raw integer limbs, group_ids (L,) int32 in
    [0, n_groups] (n_groups = pad sentinel, sorts past every real
    bucket), points (coords..., L*precompute) — interleaved
    precompute_bases layout when precompute > 1 (copy m of scalar lane
    i is point lane i*p + m, so a scalar slice [s0:s1) pairs with the
    contiguous point rows [p*s0 : p*s1)). Returns stacked window sums
    (3, coords..., G, Wp); groups with no lanes in this slice contribute
    exact identities (every bucket empty -> telescoped sum cancels).

    This is the out-of-core formulation (reference: multi_chunked_msm,
    cuda_msm.cuh:1256-1395): the caller accumulates slice sums window-
    wise, so all slices share ONE compiled pipeline and no group pads
    to a slice boundary on its own.
    """
    p = precompute
    n_buckets = (1 << (c - 1)) + 1 if signed else 1 << c
    if signed:
        digs, negs = window_digits_signed(scalars, c)
    else:
        digs, negs = window_digits(scalars, c), None
    if p > 1:
        w_total = -(-16 * scalars.shape[0] // c)
        wp = -(-w_total // p)
        digs = _merge_digit_windows(digs, p, wp, 0)
        if negs is not None:
            negs = _merge_digit_windows(negs, p, wp, False)
        group_ids = jnp.repeat(group_ids, p)
    keys = digs.astype(jnp.int32) + group_ids[None, :] * jnp.int32(n_buckets)
    return _windows_pipeline(points, keys, negs, ops, c, k, n_groups, signed)


# ------------------------------------------------------------------ host side

def _limbs_to_fq(arr) -> int:
    return fq_from_mont(lb.limbs_to_ints_np(np.asarray(arr).reshape(NLIMB, 1))[0])


def window_points_to_host_g1(wsums, g: int = 0) -> list:
    """wsums: stacked (3, 16, G, W) array (device or pre-fetched numpy)
    -> list of W host projective points. Pass a numpy array (one bulk
    np.asarray per MSM) when reading several groups to avoid repeated
    device fetches."""
    arr = np.asarray(wsums)
    xs, ys, zs = arr[0], arr[1], arr[2]
    return [
        (
            _limbs_to_fq(xs[:, g, w]),
            _limbs_to_fq(ys[:, g, w]),
            _limbs_to_fq(zs[:, g, w]),
        )
        for w in range(xs.shape[-1])
    ]


def window_points_to_host_g2(wsums, g: int = 0) -> list:
    arr = np.asarray(wsums)  # (3, 16, 2, G, W)
    xs, ys, zs = arr[0], arr[1], arr[2]
    return [
        (
            (_limbs_to_fq(xs[:, 0, g, w]), _limbs_to_fq(xs[:, 1, g, w])),
            (_limbs_to_fq(ys[:, 0, g, w]), _limbs_to_fq(ys[:, 1, g, w])),
            (_limbs_to_fq(zs[:, 0, g, w]), _limbs_to_fq(zs[:, 1, g, w])),
        )
        for w in range(xs.shape[-1])
    ]


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


# ------------------------------------------------------------------ public API

@serve_lean.dual_mode_jit(static_argnums=(2, 3, 4))
def _msm_g1_jit(scalar_groups, point_groups, c, k, precompute=1):
    return msm_device_grouped(
        list(scalar_groups), list(point_groups), jc.FqOps, c, k,
        precompute=precompute,
    )


@serve_lean.dual_mode_jit(static_argnums=(2, 3, 4))
def _msm_g2_jit(scalar_groups, point_groups, c, k, precompute=1):
    return msm_device_grouped(
        list(scalar_groups), list(point_groups), jc.Fq2Ops, c, k,
        precompute=precompute,
    )


# out-of-core threshold: beyond this many concatenated lanes the MSM
# runs in fixed-size slices with window sums accumulated across slices
# (the role of the reference's multi-chunk memory planner,
# cuda_msm.cuh:1131-1395) — keeps gathered copies + prefix levels
# within HBM. G2 coords are 2x the data -> half the slice.
import os as _os

MSM_MAX_LANES = int(_os.environ.get("ISTPU_MSM_MAX_LANES", str(1 << 21)))


@partial(jax.jit, static_argnums=0)
def _acc_windows(is_g2, acc, new):
    ops = jc.Fq2Ops if is_g2 else jc.FqOps
    return jc.point_stack(
        jc.padd(ops, jc.point_unstack(acc), jc.point_unstack(new))
    )


def _pad_lanes(arr, size):
    pad = size - arr.shape[-1]
    if pad == 0:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros(arr.shape[:-1] + (pad,), arr.dtype)], axis=-1
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _msm_g1_sliced_jit(scalars, gids, points, c, k, n_groups, precompute=1):
    return msm_device_grouped_sliced(
        scalars, gids, points, jc.FqOps, c, k, n_groups, precompute=precompute
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _msm_g2_sliced_jit(scalars, gids, points, c, k, n_groups, precompute=1):
    return msm_device_grouped_sliced(
        scalars, gids, points, jc.Fq2Ops, c, k, n_groups, precompute=precompute
    )


def _slice_concat(arrays, lo: int, hi: int, pad_shape_of=None):
    """The [lo, hi) window of the VIRTUAL concatenation of `arrays`
    along the last axis, zero-padded to width hi-lo. Materializes only
    one slice-sized array (never the full concatenation)."""
    pieces, pos = [], 0
    for arr in arrays:
        n = arr.shape[-1]
        s, e = max(lo - pos, 0), min(hi - pos, n)
        if s < e:
            pieces.append(arr[..., s:e])
        pos += n
    width = sum(p.shape[-1] for p in pieces)
    pad = (hi - lo) - width
    if pad:
        ref = pieces[0] if pieces else arrays[0]
        pieces.append(jnp.zeros(ref.shape[:-1] + (pad,), ref.dtype))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=-1)


def msm_windows_sliced(groups, c, k, g2: bool, max_lanes: int,
                       precompute: int = 1):
    """Out-of-core GROUPED window sums: the virtual concatenation of
    all (scalars, points) groups is cut into fixed max_lanes slices
    (group boundaries may fall inside a slice — group-id keys keep the
    buckets separate), and per-window sums accumulate across slices in
    fixed order (deterministic). One compiled pipeline for every slice,
    no per-group padding waste, and HBM holds at most ONE slice of
    assembled copies at a time (the memory-planner role of the
    reference's multi_chunked_msm, cuda_msm.cuh:1131-1395).
    max_lanes bounds POINT lanes (the HBM working set): with
    precompute p the scalar slice width is max_lanes // p.
    Returns stacked (3, coords..., G, W)."""
    n_groups = len(groups)
    p = precompute
    sw = max(k, (max_lanes // p) // k * k)  # scalar lanes per slice
    total = sum(s.shape[-1] for s, _ in groups)
    n_slices = -(-total // sw)
    sizes = [s.shape[-1] for s, _ in groups]

    # group ids are static per layout: numpy, sliced per window
    gid_np = np.concatenate(
        [np.full(n, g, np.int32) for g, n in enumerate(sizes)]
        + [np.full(n_slices * sw - total, n_groups, np.int32)]
    )

    scal = [s for s, _ in groups]
    ncoords = len(groups[0][1])
    coord_sets = [[pg[i] for _, pg in groups] for i in range(ncoords)]

    jit_fn = _msm_g2_sliced_jit if g2 else _msm_g1_sliced_jit
    acc = None
    for s in range(n_slices):
        lo, hi = s * sw, (s + 1) * sw
        sl_sc = _slice_concat(scal, lo, hi)
        sl_gid = jnp.asarray(gid_np[lo:hi])
        sl_pts = tuple(_slice_concat(cs, p * lo, p * hi) for cs in coord_sets)
        ws = jit_fn(sl_sc, sl_gid, sl_pts, c, k, n_groups, p)
        acc = ws if acc is None else _acc_windows(g2, acc, ws)
        del sl_sc, sl_pts, ws
        if s < n_slices - 1:
            # force execution so XLA frees this slice's assembled
            # copies before the next is staged — async dispatch would
            # otherwise hold EVERY slice's inputs in HBM at once (the
            # 3.2M OOM). Tiny fetch: block_until_ready does not block
            # over the remote-TPU tunnel. The LAST slice stays async so
            # the caller's next pipeline (e.g. G2) can overlap it.
            np.asarray(jax.device_get(acc[0].ravel()[:1]))
    return acc  # (3, coords..., G, W)


def _msm_windows_chunked(scalars, points, c, k, g2: bool, max_lanes: int):
    """Single-group out-of-core window sums (sliced-grouped with G=1)."""
    return msm_windows_sliced([(scalars, points)], c, k, g2, max_lanes)


def msm_g1_many(groups, c: int | None = None, k: int = 32) -> list:
    """Batched G1 MSMs: groups = [(scalars (16,n_i), (x, y)), ...].
    Returns a list of host projective points (ints, standard form)."""
    total = sum(s.shape[-1] for s, _ in groups)
    # c is tuned to the lanes one pipeline instance actually processes
    # (a slice, when out of core)
    c = c or choose_c(min(total, MSM_MAX_LANES), groups=len(groups))
    if total > MSM_MAX_LANES:
        wsums = np.asarray(msm_windows_sliced(groups, c, k, False, MSM_MAX_LANES))
    else:
        wsums = np.asarray(_msm_g1_jit(
            tuple(s for s, _ in groups), tuple(p for _, p in groups), c, k
        ))  # one bulk fetch for all groups
    return [
        horner_combine(window_points_to_host_g1(wsums, g), c)
        for g in range(len(groups))
    ]


def _cfg_params(cfg, c, k):
    """Merge an MSMConfig (reference: MSMConfig, msm/mod.rs:13-73) with
    direct keyword overrides. Returns (c, k, precompute_factor)."""
    if cfg is None:
        return c, k, 1
    return (c or (cfg.c or None)), (cfg.chunk if k == 32 else k), cfg.precompute_factor


def msm_g1(scalars, points_affine, c: int | None = None, k: int = 32, cfg=None):
    """Single G1 MSM. scalars (16,n) uint32 limbs (integer semantics),
    points (x, y) tuple of (16, n) Montgomery-form coordinate limbs —
    or (16, n*factor) interleaved precompute_bases output when
    cfg.precompute_factor > 1. Returns a host projective point (ints,
    standard form)."""
    c, k, pre = _cfg_params(cfg, c, k)
    if pre > 1:
        n = scalars.shape[-1]
        c = c or choose_c(min(n * pre, MSM_MAX_LANES))
        ws = _msm_g1_jit((scalars,), (points_affine,), c, k, pre)
        return horner_combine(window_points_to_host_g1(np.asarray(ws), 0), c)
    return msm_g1_many([(scalars, points_affine)], c=c, k=k)[0]


def msm_g2(scalars, points_affine, c: int | None = None, k: int = 32, cfg=None):
    c, k, pre = _cfg_params(cfg, c, k)
    n = scalars.shape[-1]
    if pre > 1:
        c = c or choose_c(min(n * pre, MSM_MAX_LANES // 2))
        ws = _msm_g2_jit((scalars,), (points_affine,), c, k, pre)
        return horner_combine(window_points_to_host_g2(np.asarray(ws), 0), c, g2=True)
    c = c or choose_c(min(n, MSM_MAX_LANES // 2))
    if n > MSM_MAX_LANES // 2:
        ws = msm_windows_sliced(
            [(scalars, points_affine)], c, k, True, MSM_MAX_LANES // 2
        )
        return horner_combine(window_points_to_host_g2(np.asarray(ws), 0), c, g2=True)
    wsums = _msm_g2_jit((scalars,), (points_affine,), c, k)
    return horner_combine(window_points_to_host_g2(np.asarray(wsums), 0), c, g2=True)


# back-compat aliases used by the parallel layer
_window_points_to_host_g1 = window_points_to_host_g1
_window_points_to_host_g2 = window_points_to_host_g2
