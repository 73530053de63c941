"""Generic TPU device ops for any registered curve.

The multi-curve analog of curve/jcurve.py's BN254-specialised tables:
factories producing field-op vtables over the generalized limb layer
(fields/limbs.py, spec-driven limb counts), consumable by the SAME
point formulas (jcurve.padd/pmadd/pdbl) and the SAME MSM pipeline
(ops/msm.py) — mirroring how the reference instantiates its generic
templates per curve (impl_curve!/impl_msm! macros,
/root/reference/wrappers/rust/icicle-core/src/curve.rs,
 icicle-curves/icicle-bls12-377/src/curve.rs).

BN254 keeps its specialised fast path (jcurve.FqOps); these tables are
instantiated for bls12_377, bls12_381 and bw6_761.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import jcurve as jc
from ..fields import limbs as lb
from ..fields.limbs import U32, FieldSpec
from ..ops import msm as msm_ops
from . import host
from .params import CurveParams, get_curve


def _small_signed(v: int, q: int, limit: int = 32):
    """Represent v mod q as a small signed int if possible."""
    if v <= limit:
        return v
    if q - v <= limit:
        return -(q - v)
    return None


class LimbFieldOps:
    """Fq vtable over (nlimb, ...) limb arrays for an arbitrary spec."""

    def __init__(self, spec: FieldSpec, b3_int: int):
        self.spec = spec
        self.coord_shape = (spec.nlimb,)
        self._b3_int = b3_int % spec.modulus
        self._b3_small = _small_signed(self._b3_int, spec.modulus)
        if self._b3_small is not None:
            # expose the cheap path jcurve looks for
            self.mul_b3 = self._mul_b3_small

    def add(self, a, b):
        return lb.add_mod(a, b, self.spec)

    def sub(self, a, b):
        return lb.sub_mod(a, b, self.spec)

    def mul(self, a, b):
        return lb.mont_mul(a, b, self.spec)

    def mul_many(self, pairs):
        k = len(pairs)
        shape = jnp.broadcast_shapes(
            *[jnp.broadcast_shapes(a.shape, b.shape) for a, b in pairs]
        )
        squeeze = len(shape) == 1
        if squeeze:
            shape = shape + (1,)
        A = jnp.concatenate(
            [jnp.broadcast_to(a.reshape(a.shape + (1,) * squeeze), shape) for a, _ in pairs],
            axis=-1,
        )
        B = jnp.concatenate(
            [jnp.broadcast_to(b.reshape(b.shape + (1,) * squeeze), shape) for _, b in pairs],
            axis=-1,
        )
        P = lb.mont_mul(A, B, self.spec)
        out = jnp.split(P, k, axis=-1)
        return [o[..., 0] for o in out] if squeeze else out

    def neg(self, a):
        return lb.neg_mod(a, self.spec)

    def is_zero(self, a):
        return lb.is_zero(a)

    def const(self, v: int, shape=()):
        return lb.const_limbs(v * self.spec.r_mod % self.spec.modulus, shape, self.spec)

    def b3(self, shape=()):
        return self.const(self._b3_int, shape)

    def _mul_b3_small(self, x):
        k = abs(self._b3_small)
        acc = None
        bit_vals = x
        kk = k
        while kk:
            if kk & 1:
                acc = bit_vals if acc is None else lb.add_mod(acc, bit_vals, self.spec)
            kk >>= 1
            if kk:
                bit_vals = lb.add_mod(bit_vals, bit_vals, self.spec)
        if self._b3_small < 0:
            acc = lb.neg_mod(acc, self.spec)
        return acc


class LimbFq2Ops:
    """Fq2 vtable over (nlimb, 2, ...) arrays, u^2 = nonresidue."""

    def __init__(self, spec: FieldSpec, nonresidue: int, b3_fq2: tuple):
        self.spec = spec
        self.coord_shape = (spec.nlimb, 2)
        self._nr = nonresidue % spec.modulus
        self._nr_small = _small_signed(self._nr, spec.modulus)
        self._b3_val = tuple(v % spec.modulus for v in b3_fq2)

    # -- scalar-field helpers
    def _fadd(self, a, b):
        return lb.add_mod(a, b, self.spec)

    def _fsub(self, a, b):
        return lb.sub_mod(a, b, self.spec)

    def _mul_nr(self, t):
        """nonresidue * t (small signed chain or full mul)."""
        if self._nr_small is not None:
            k = abs(self._nr_small)
            acc = None
            cur = t
            while k:
                if k & 1:
                    acc = cur if acc is None else self._fadd(acc, cur)
                k >>= 1
                if k:
                    cur = self._fadd(cur, cur)
            if self._nr_small < 0:
                acc = lb.neg_mod(acc, self.spec)
            return acc
        nr = lb.const_limbs(
            self._nr * self.spec.r_mod % self.spec.modulus,
            (1,) * (t.ndim - 1), self.spec,
        )
        return lb.mont_mul(t, nr, self.spec)

    # -- vtable
    def add(self, a, b):
        return lb.add_mod(a, b, self.spec)  # component axis broadcasts

    def sub(self, a, b):
        return lb.sub_mod(a, b, self.spec)

    def mul(self, a, b):
        return self.mul_many([(a, b)])[0]

    def mul_many(self, pairs):
        """Karatsuba over the pair list: (a0+a1u)(b0+b1u) =
        (T0 + nr*T1) + (T2 - T0 - T1)u with T2 = (a0+a1)(b0+b1)."""
        k = len(pairs)
        shape = jnp.broadcast_shapes(
            *[jnp.broadcast_shapes(a.shape, b.shape) for a, b in pairs]
        )
        squeeze = len(shape) == 2
        if squeeze:
            shape = shape + (1,)
            pairs = [(a[..., None], b[..., None]) for a, b in pairs]
        pairs = [
            (jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)) for a, b in pairs
        ]
        A0 = jnp.concatenate([a[:, 0] for a, _ in pairs], axis=-1)
        A1 = jnp.concatenate([a[:, 1] for a, _ in pairs], axis=-1)
        B0 = jnp.concatenate([b[:, 0] for _, b in pairs], axis=-1)
        B1 = jnp.concatenate([b[:, 1] for _, b in pairs], axis=-1)
        SA = self._fadd(A0, A1)
        SB = self._fadd(B0, B1)
        P = lb.mont_mul(
            jnp.concatenate([A0, A1, SA], axis=-1),
            jnp.concatenate([B0, B1, SB], axis=-1),
            self.spec,
        )
        T0, T1, T2 = jnp.split(P, 3, axis=-1)
        C0 = self._fadd(T0, self._mul_nr(T1))
        C1 = self._fsub(T2, self._fadd(T0, T1))
        out = jnp.stack([C0, C1], axis=1)
        outs = jnp.split(out, k, axis=-1)
        return [o[..., 0] for o in outs] if squeeze else outs

    def neg(self, a):
        return lb.neg_mod(a, self.spec)

    def is_zero(self, a):
        acc = a[0]
        for i in range(1, self.spec.nlimb):
            acc = acc | a[i]
        return (acc[0] | acc[1]) == 0

    def const(self, v2: tuple, shape=()):
        r = self.spec.r_mod
        q = self.spec.modulus
        return jnp.stack(
            [
                lb.const_limbs(v2[0] * r % q, shape, self.spec),
                lb.const_limbs(v2[1] * r % q, shape, self.spec),
            ],
            axis=1,
        )

    def b3(self, shape=()):
        return self.const(self._b3_val, shape)


# ---------------------------------------------------------------- factories

_OPS_CACHE: dict = {}


def curve_specs(name: str) -> tuple:
    """(fq_spec, fr_spec) for a registered curve."""
    p = get_curve(name)
    key = ("specs", name)
    if key not in _OPS_CACHE:
        _OPS_CACHE[key] = (
            FieldSpec(modulus=p.q, name=f"{name}_fq"),
            FieldSpec(modulus=p.r, name=f"{name}_fr"),
        )
    return _OPS_CACHE[key]


def g1_ops(name: str) -> LimbFieldOps:
    key = ("g1", name)
    if key not in _OPS_CACHE:
        p = get_curve(name)
        fq, _ = curve_specs(name)
        _OPS_CACHE[key] = LimbFieldOps(fq, 3 * p.g1_b)
    return _OPS_CACHE[key]


def g2_ops(name: str):
    key = ("g2", name)
    if key not in _OPS_CACHE:
        p = get_curve(name)
        fq, _ = curve_specs(name)
        if p.fp2_nonresidue is None:
            # bw6-761: G2 is over Fp (M-twist)
            _OPS_CACHE[key] = LimbFieldOps(fq, 3 * p.g2_b)
        else:
            b3 = tuple(3 * v % p.q for v in p.g2_b)
            _OPS_CACHE[key] = LimbFq2Ops(fq, p.fp2_nonresidue, b3)
    return _OPS_CACHE[key]


@partial(jax.jit, static_argnums=(2, 3, 4))
def _window_sums_jit(sc, pts, ops, c: int, k: int):
    """One compiled MSM window pipeline per (ops instance, c, k)."""
    return msm_ops.msm_device_grouped([sc], [pts], ops, c=c, k=k)


# ---------------------------------------------------------------- conversions

def affine_to_device(points, ops):
    """List of host affine points (None = infinity) -> Montgomery limb
    coordinate arrays matching ops.coord_shape + (n,)."""
    spec = ops.spec
    q, r = spec.modulus, spec.r_mod

    def enc(v):
        return v * r % q

    n = len(points)
    fp2 = len(ops.coord_shape) == 2
    if fp2:
        xs = [(0, 0) if a is None else a[0] for a in points]
        ys = [(0, 0) if a is None else a[1] for a in points]
        x = jnp.stack(
            [
                jnp.asarray(lb.ints_to_limbs_np([enc(v[0]) for v in xs], spec.nlimb)),
                jnp.asarray(lb.ints_to_limbs_np([enc(v[1]) for v in xs], spec.nlimb)),
            ],
            axis=1,
        )
        y = jnp.stack(
            [
                jnp.asarray(lb.ints_to_limbs_np([enc(v[0]) for v in ys], spec.nlimb)),
                jnp.asarray(lb.ints_to_limbs_np([enc(v[1]) for v in ys], spec.nlimb)),
            ],
            axis=1,
        )
        return (x, y)
    xs = [0 if a is None else enc(a[0]) for a in points]
    ys = [0 if a is None else enc(a[1]) for a in points]
    return (
        jnp.asarray(lb.ints_to_limbs_np(xs, spec.nlimb)),
        jnp.asarray(lb.ints_to_limbs_np(ys, spec.nlimb)),
    )


def _coord_to_int(arr, spec) -> int:
    v = lb.limbs_to_ints_np(np.asarray(arr).reshape(spec.nlimb, 1))[0]
    return v * spec.rinv % spec.modulus


def window_points_to_host(wsums, ops, g: int = 0) -> list:
    """Device window sums -> list of host projective points (ints)."""
    spec = ops.spec
    fp2 = len(ops.coord_shape) == 2
    out = []
    stacked = np.asarray(wsums)  # (3, coords..., G, W) — one fetch
    arrs = [stacked[0], stacked[1], stacked[2]]
    n_w = arrs[0].shape[-1]
    for w in range(n_w):
        coords = []
        for a in arrs:
            if fp2:
                coords.append(
                    (
                        _coord_to_int(a[:, 0, g, w], spec),
                        _coord_to_int(a[:, 1, g, w], spec),
                    )
                )
            else:
                coords.append(_coord_to_int(a[:, g, w], spec))
        out.append(tuple(coords))
    return out


def msm(name: str, scalars: list, points_affine: list, g2: bool = False,
        c: int = 8, k: int = 8, jit: bool = True):
    """Generic-curve MSM: host scalars + affine points -> host
    projective point. Runs the SAME grouped-window device pipeline as
    the BN254 prover (ops/msm.py) over this curve's ops table.

    jit=False runs the pipeline eagerly — for tiny differential tests
    on the CPU backend, where one giant jit graph (48-limb bw6-761
    fields, 48 windows) compiles for tens of minutes but the eager
    per-op dispatches cache instantly."""
    p = get_curve(name)
    ops = g2_ops(name) if g2 else g1_ops(name)
    _, fr = curve_specs(name)
    sc = jnp.asarray(lb.ints_to_limbs_np([s % p.r for s in scalars], fr.nlimb))
    pts = affine_to_device(points_affine, ops)
    if jit:
        ws = _window_sums_jit(sc, pts, ops, c, k)
    else:
        ws = msm_ops.msm_device_grouped([sc], [pts], ops, c=c, k=k)
    window_pts = window_points_to_host(ws, ops, 0)
    hcurve = host.g2_curve(p) if g2 else host.g1_curve(p)
    acc = hcurve.zero_pt
    for wp in reversed(window_pts):
        for _ in range(c):
            acc = hcurve.dbl(acc)
        acc = hcurve.add(acc, wp)  # complete formulas: z=0 is identity
    return acc
