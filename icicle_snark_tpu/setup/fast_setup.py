"""Device-accelerated trusted-setup generator.

Point generation dominates setup cost (5 fixed-base scalar muls per
constraint); the host-oracle FixedBase path is O(minutes) per million
constraints in Python. This backend runs the fixed-base multiplies as
batched windowed table lookups ON DEVICE:

  * host builds the tiny window tables T[w][d] = d * 2^(8w) * G
    (32 x 256 points per group, a few thousand host adds),
  * the device gathers T[w][digit_w(k_i)] and pmadd-accumulates over a
    32-step lax.scan — n parallel lanes, 32 sequential point adds each,
  * projective -> affine via chunked Montgomery batch inversion on
    device (no per-point host inversions),
  * coordinates download Montgomery-form and are written to the zkey
    byte-for-byte identical to the host backend's output (tested).

This has no reference analog (the reference delegates setup to
circom/snarkjs, /root/reference/scripts/setup.sh) but is required for
self-contained 1.6M/3.2M-constraint benchmarks (BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import jcurve as jc
from ..fields import limbs as lb
from ..fields.limbs import FQ_SPEC, NLIMB
from ..refmath import curve as cv
from ..refmath import tower as tw
from ..refmath.field import Q, fq_to_mont
from .r1cs import R1CS
from .trusted_setup import (
    FixedBase,
    SetupScalars,
    ToxicWaste,
    _fixed_bases,
    write_zkey,
)

WINDOW = 8
N_WINDOWS = 256 // WINDOW


def _table_g1(fb: FixedBase) -> tuple:
    """Host FixedBase table -> device (16, W, 256) affine limb arrays.

    The identity (d=0) encodes as (0,0), which pmadd treats as identity.
    """
    xs = np.zeros((NLIMB, N_WINDOWS, 256), np.uint32)
    ys = np.zeros((NLIMB, N_WINDOWS, 256), np.uint32)
    for w in range(N_WINDOWS):
        for d in range(1, 256):
            x, y = cv.g1_to_affine(fb.table[w][d])
            xs[:, w, d] = lb.int_to_limbs_np(fq_to_mont(x))
            ys[:, w, d] = lb.int_to_limbs_np(fq_to_mont(y))
    return jnp.asarray(xs), jnp.asarray(ys)


def _table_g2(fb: FixedBase) -> tuple:
    xs = np.zeros((NLIMB, 2, N_WINDOWS, 256), np.uint32)
    ys = np.zeros((NLIMB, 2, N_WINDOWS, 256), np.uint32)
    for w in range(N_WINDOWS):
        for d in range(1, 256):
            (x, y) = cv.g2_to_affine(fb.table[w][d])
            for comp in range(2):
                xs[:, comp, w, d] = lb.int_to_limbs_np(fq_to_mont(x[comp]))
                ys[:, comp, w, d] = lb.int_to_limbs_np(fq_to_mont(y[comp]))
    return jnp.asarray(xs), jnp.asarray(ys)


def _digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """(16, n) 16-bit limbs -> (32, n) 8-bit window digits."""
    lo = scalars & np.uint32(0xFF)
    hi = scalars >> np.uint32(8)
    return jnp.stack([lo, hi], axis=1).reshape(2 * NLIMB, -1)


def _fixed_base_msm(scalars, table, ops):
    """P_i = k_i * G for all i: scan over windows of table gathers."""
    digs = _digits(scalars)  # (32, n)

    def body(acc, wd):
        w, d = wd
        tx = table[0][..., w, :]
        ty = table[1][..., w, :]
        q = (jnp.take(tx, d, axis=-1), jnp.take(ty, d, axis=-1))
        return jc.pmadd(ops, acc, q), None

    n = digs.shape[-1]
    acc0 = jc.identity(ops, (n,))
    acc, _ = jax.lax.scan(body, acc0, (jnp.arange(N_WINDOWS), digs))
    return acc


def _to_affine_bytes(proj, ops) -> bytes:
    """Projective device points -> snarkjs affine Montgomery bytes."""
    x, y, z = proj
    inf = ops.is_zero(z)
    if ops is jc.FqOps:
        safe_z = jnp.where(inf[None], jnp.asarray(
            FQ_SPEC.one_mont_limbs.reshape(NLIMB, 1), lb.U32), z)
        zi = lb.batch_inv(safe_z, FQ_SPEC)
        ax = lb.mont_mul(x, zi, FQ_SPEC)
        ay = lb.mont_mul(y, zi, FQ_SPEC)
        mask = ~inf
        ax = ax * mask[None]
        ay = ay * mask[None]
        xw = lb.limbs_to_u32x8(np.asarray(ax))  # (n, 8)
        yw = lb.limbs_to_u32x8(np.asarray(ay))
        return np.concatenate([xw, yw], axis=1).astype("<u4").tobytes()
    else:
        one2 = np.zeros((NLIMB, 2, 1), np.uint32)
        one2[:, 0, 0] = FQ_SPEC.one_mont_limbs
        safe_z = jnp.where(inf[None, None], jnp.asarray(one2), z)
        # Fq2 inverse: (a+bu)^-1 = (a-bu)/(a^2+b^2)
        a, b = safe_z[:, 0], safe_z[:, 1]
        norm = lb.add_mod(
            lb.mont_mul(a, a, FQ_SPEC), lb.mont_mul(b, b, FQ_SPEC), FQ_SPEC
        )
        ninv = lb.batch_inv(norm, FQ_SPEC)
        zi = jnp.stack(
            [lb.mont_mul(a, ninv, FQ_SPEC),
             lb.mont_mul(lb.neg_mod(b, FQ_SPEC), ninv, FQ_SPEC)],
            axis=1,
        )
        ax = jc.Fq2Ops.mul(x, zi)
        ay = jc.Fq2Ops.mul(y, zi)
        mask = ~inf
        ax = ax * mask[None, None]
        ay = ay * mask[None, None]
        ax, ay = np.asarray(ax), np.asarray(ay)
        cols = [ax[:, 0], ax[:, 1], ay[:, 0], ay[:, 1]]
        words = [lb.limbs_to_u32x8(c) for c in cols]  # each (n, 8)
        return np.concatenate(words, axis=1).astype("<u4").tobytes()


def _g1_points_bytes(scalars_ints, table) -> bytes:
    sc = jnp.asarray(lb.ints_to_limbs_np(scalars_ints))
    proj = _fixed_base_msm(sc, table, jc.FqOps)
    return _to_affine_bytes(proj, jc.FqOps)


def _g2_points_bytes(scalars_ints, table) -> bytes:
    sc = jnp.asarray(lb.ints_to_limbs_np(scalars_ints))
    proj = _fixed_base_msm(sc, table, jc.Fq2Ops)
    return _to_affine_bytes(proj, jc.Fq2Ops)


def groth16_setup_device(r1cs: R1CS, zkey_path: str, vk_path: str | None = None,
                         seed: bytes = b"icicle-snark-tpu-test-setup",
                         chunk: int = 1 << 18):
    """Device-backed trusted setup; byte-identical output to
    trusted_setup.groth16_setup for the same seed."""
    waste = ToxicWaste(seed)
    scal = SetupScalars(r1cs, waste)
    fb1, fb2 = _fixed_bases()
    t1 = _table_g1(fb1)
    t2 = _table_g2(fb2)

    def gen1(ints):
        parts = [
            _g1_points_bytes(ints[i : i + chunk], t1)
            for i in range(0, len(ints), chunk)
        ]
        return b"".join(parts)

    def gen2(ints):
        parts = [
            _g2_points_bytes(ints[i : i + chunk], t2)
            for i in range(0, len(ints), chunk)
        ]
        return b"".join(parts)

    g1_points = {
        "a": gen1(scal.u),
        "b1": gen1(scal.v),
        "c": gen1(scal.c),
        "h": gen1(scal.h),
        # small host-side pieces (exact-form parity with the oracle)
        "ic": [fb1.mul(k) for k in scal.ic],
        "alpha": fb1.mul(waste.alpha),
        "beta": fb1.mul(waste.beta),
        "delta": fb1.mul(waste.delta),
    }
    g2_points = {
        "b2": gen2(scal.v),
        "beta": fb2.mul(waste.beta),
        "gamma": fb2.mul(waste.gamma),
        "delta": fb2.mul(waste.delta),
    }
    return write_zkey(scal, r1cs, zkey_path, vk_path, g1_points, g2_points)
