"""Pallas field/point kernels vs the XLA limb layer.

On CPU the kernels run in pallas INTERPRET mode (exact same math), so
the suite always exercises them; on a real TPU the compiled kernels
are covered too (the round-2 A/B measurements live in ROADMAP.md:
mont_mul 656 Mmul/s @B=512, pmadd 61 ns/lane — parity with XLA)."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from icicle_snark_tpu.curve import jcurve as jc
from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops.pallas_field import mont_mul_pallas, pmadd_pallas
from icicle_snark_tpu.refmath import curve as rcv
from icicle_snark_tpu.refmath.field import Q, R_MOD, fq_to_mont, fr_to_mont

rng = random.Random(3)
_INTERPRET = jax.devices()[0].platform != "tpu"


def test_pallas_mont_mul_matches():
    n = 64
    a_int = [rng.randrange(R_MOD) for _ in range(n)]
    b_int = [rng.randrange(R_MOD) for _ in range(n)]
    a = jnp.asarray(lb.ints_to_limbs_np([fr_to_mont(v) for v in a_int]))
    b = jnp.asarray(lb.ints_to_limbs_np([fr_to_mont(v) for v in b_int]))
    want = np.asarray(lb.mont_mul(a, b, lb.FR_SPEC))
    got = np.asarray(mont_mul_pallas(a, b, lb.FR_SPEC, block=32,
                                     interpret=_INTERPRET))
    assert np.array_equal(want, got)


def test_pallas_pmadd_matches():
    n = 32
    aff = [rcv.g1_to_affine(rcv.g1_mul(rcv.G1_GEN, k + 1)) for k in range(n)]
    qx = jnp.asarray(lb.ints_to_limbs_np([fq_to_mont(p[0]) for p in aff]))
    qy = jnp.asarray(lb.ints_to_limbs_np([fq_to_mont(p[1]) for p in aff]))
    qx = qx.at[:, 5].set(0)
    qy = qy.at[:, 5].set(0)  # identity lane
    proj = [rcv.g1_mul(rcv.G1_GEN, 7 * k + 3) for k in range(n)]
    px = jnp.asarray(lb.ints_to_limbs_np([fq_to_mont(p[0]) for p in proj]))
    py = jnp.asarray(lb.ints_to_limbs_np([fq_to_mont(p[1]) for p in proj]))
    pz = jnp.asarray(lb.ints_to_limbs_np([fq_to_mont(p[2]) for p in proj]))
    want = np.asarray(jc.point_stack(jc.pmadd(jc.FqOps, (px, py, pz), (qx, qy))))
    got = np.asarray(pmadd_pallas(jnp.stack([px, py, pz]), qx, qy,
                                  lb.FQ_SPEC, block=32, interpret=_INTERPRET))
    assert np.array_equal(want, got)
