"""Fast-tier D=8 sharded-prove smoke: the exact code path the driver's
`dryrun_multichip` gate exercises (3-phase sharded prove on the
committed tiny fixture with HOST-precomputed factor-8 bases), run
inline on the virtual 8-device CPU mesh — a cheap CI proxy so dryrun
regressions surface in `pytest -m fast` instead of only in the driver
artifact (VERDICT r2 item 7).

Beyond smoke, this now VALIDATES the result: every G1/G2 MSM window-sum
output is Horner-combined on the host and compared against a direct
refmath evaluation  sum_i s_i * P_i  over the same scalars (including
the phase-A h output) and the fixture's original (non-precomputed)
points — so the precompute copies, merged digit windows, telescoped
buckets and cross-device combine must all agree with the bigint oracle.

Graph-size knobs mirror __graft_entry__._dryrun_inline: c=5 / f=8 /
k=64; conftest already forces the 8-device CPU platform and lean flags.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.io.wtns import WtnsFile
from icicle_snark_tpu.ops import msm as msm_ops
from icicle_snark_tpu.parallel.mesh import make_mesh
from icicle_snark_tpu.parallel.prove_step import run_sharded_prove
from icicle_snark_tpu.refmath import curve as rcv
from icicle_snark_tpu.refmath.field import fq_from_mont

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _g1_host_points(points):
    """(x, y) Montgomery limb arrays -> list of refmath projective."""
    xs = [fq_from_mont(v) for v in lb.limbs_to_ints_np(np.asarray(points[0]))]
    ys = [fq_from_mont(v) for v in lb.limbs_to_ints_np(np.asarray(points[1]))]
    return [
        rcv.g1_from_affine((x, y)) for x, y in zip(xs, ys)
    ]


def _g2_host_points(points):
    x, y = (np.asarray(a) for a in points)
    n = x.shape[-1]
    x0 = [fq_from_mont(v) for v in lb.limbs_to_ints_np(x[:, 0])]
    x1 = [fq_from_mont(v) for v in lb.limbs_to_ints_np(x[:, 1])]
    y0 = [fq_from_mont(v) for v in lb.limbs_to_ints_np(y[:, 0])]
    y1 = [fq_from_mont(v) for v in lb.limbs_to_ints_np(y[:, 1])]
    return [
        rcv.g2_from_affine(((x0[i], x1[i]), (y0[i], y1[i]))) for i in range(n)
    ]


def _oracle_msm_g1(scalars, points):
    acc = rcv.G1_ZERO
    for s, p in zip(scalars, points):
        if s:
            acc = rcv.g1_add(acc, rcv.g1_mul(p, s))
    return acc


def _oracle_msm_g2(scalars, points):
    acc = rcv.G2_ZERO
    for s, p in zip(scalars, points):
        if s:
            acc = rcv.g2_add(acc, rcv.g2_mul(p, s))
    return acc


def test_dryrun_shaped_sharded_prove_d8():
    # conftest already selects the lean (scan-carry) limb graphs the
    # dryrun subprocess compiles — limbs.py reads the env at IMPORT,
    # so a fixture would be too late.
    from __graft_entry__ import _tiny_fixture

    cache, wtns_path = _tiny_fixture()
    plain = cache  # original (pre=1) points for the oracle
    cache = dataclasses.replace(
        cache,
        points_a=msm_ops.precompute_bases_host(cache.points_a, 5, 8),
        points_b1=msm_ops.precompute_bases_host(cache.points_b1, 5, 8),
        points_c=msm_ops.precompute_bases_host(cache.points_c, 5, 8),
        points_h=msm_ops.precompute_bases_host(cache.points_h, 5, 8),
        points_b2=msm_ops.precompute_bases_host(cache.points_b2, 5, 8, g2=True),
        msm_c=5, msm_pre=8, msm_c2=5, msm_pre2=8,
    )
    wtns = WtnsFile(wtns_path)
    witness = jnp.asarray(lb.u32x8_to_limbs(wtns.witness_limbs()))

    mesh = make_mesh(jax.devices()[:8])
    h, ws_g1, ws_b2 = run_sharded_prove(mesh, cache, witness, k=64)
    jax.block_until_ready(ws_b2)
    ws_g1 = np.asarray(ws_g1)
    # structural sanity: replicated window sums, merged window count
    assert ws_g1.shape[2] == 4  # 4 G1 groups
    w_total = -(-256 // 5)  # 52 digit windows at c=5
    assert ws_g1.shape[-1] == -(-w_total // 8)  # merged: wp = ceil(52/8) = 7

    # ---- oracle validation: Horner(ws) == sum_i s_i * P_i (refmath)
    hdr = cache.header
    wit_ints = lb.limbs_to_ints_np(np.asarray(witness))
    h_ints = lb.limbs_to_ints_np(np.asarray(h))
    scal = [wit_ints, wit_ints, wit_ints[hdr.n_public + 1:], h_ints]
    pts = [plain.points_a, plain.points_b1, plain.points_c, plain.points_h]
    for g in range(4):
        got = msm_ops.horner_combine(
            msm_ops.window_points_to_host_g1(ws_g1, g), 5
        )
        want = _oracle_msm_g1(scal[g], _g1_host_points(pts[g]))
        assert rcv.g1_eq(got, want), f"G1 group {g} mismatch vs oracle"
    got2 = msm_ops.horner_combine(
        msm_ops.window_points_to_host_g2(ws_b2, 0), 5, g2=True
    )
    want2 = _oracle_msm_g2(wit_ints, _g2_host_points(plain.points_b2))
    assert rcv.g2_eq(got2, want2), "G2 mismatch vs oracle"
