"""Batched BN254 G1/G2 point arithmetic on TPU (JAX limb field layer).

Complete a=0 short-Weierstrass formulas (Renes-Costello-Batina 2015,
algorithms 7/8/9) — branch-free, identity-safe, so they vectorize over
arbitrary point batches including infinities and doublings. Same formula
family as the reference's device code
(/root/reference/icicle/include/icicle/curves/projective.h:54-120), but
expressed as XLA elementwise graphs over (16, ...) limb arrays instead
of per-thread CUDA scalars.

Point representations (Montgomery-form limbs):
  G1: dict-free tuple (x, y, z), each (16, ...)
  G2: tuple (x, y, z), each (2, 16, ...)  [Fq2 components stacked first]
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax.numpy as jnp

from ..fields import limbs as lb
from ..fields.limbs import FQ_SPEC, NLIMB
from ..refmath.curve import B_G1, B_G2
from ..refmath.field import Q, fq_to_mont


# --------------------------------------------------------------- field vtables

class FqOps:
    """Base-field ops on (16, ...) limb arrays."""

    coord_shape = (NLIMB,)

    @staticmethod
    def add(a, b):
        return lb.add_mod(a, b, FQ_SPEC)

    @staticmethod
    def sub(a, b):
        return lb.sub_mod(a, b, FQ_SPEC)

    @staticmethod
    def mul(a, b):
        return lb.mont_mul(a, b, FQ_SPEC)

    @staticmethod
    def neg(a):
        return lb.neg_mod(a, FQ_SPEC)

    @staticmethod
    def is_zero(a):
        return lb.is_zero(a)

    @staticmethod
    def const(v: int, shape=()):
        """Montgomery-form broadcast constant."""
        return lb.const_limbs(fq_to_mont(v), shape)

    # b3 = 3*b = 9 for G1
    @classmethod
    def b3(cls, shape=()):
        return cls.const(3 * B_G1 % Q, shape)


class Fq2Ops:
    """Quadratic-extension ops on (2, 16, ...) limb arrays (u^2 = -1)."""

    coord_shape = (2, NLIMB)

    @staticmethod
    def add(a, b):
        return lb.add_mod(a, b, FQ_SPEC)  # componentwise

    @staticmethod
    def sub(a, b):
        return lb.sub_mod(a, b, FQ_SPEC)

    @staticmethod
    def mul(a, b):
        # Karatsuba over the component axis
        a0, a1 = a[0], a[1]
        b0, b1 = b[0], b[1]
        t0 = lb.mont_mul(a0, b0, FQ_SPEC)
        t1 = lb.mont_mul(a1, b1, FQ_SPEC)
        t2 = lb.mont_mul(lb.add_mod(a0, a1, FQ_SPEC), lb.add_mod(b0, b1, FQ_SPEC), FQ_SPEC)
        c0 = lb.sub_mod(t0, t1, FQ_SPEC)
        c1 = lb.sub_mod(t2, lb.add_mod(t0, t1, FQ_SPEC), FQ_SPEC)
        return jnp.stack([c0, c1], axis=0)

    @staticmethod
    def neg(a):
        return lb.neg_mod(a, FQ_SPEC)

    @staticmethod
    def is_zero(a):
        return lb.is_zero(a[0]) & lb.is_zero(a[1])

    @staticmethod
    def const(v2: tuple, shape=()):
        return jnp.stack(
            [lb.const_limbs(fq_to_mont(v2[0]), shape), lb.const_limbs(fq_to_mont(v2[1]), shape)],
            axis=0,
        )

    @classmethod
    def b3(cls, shape=()):
        b3 = ((3 * B_G2[0]) % Q, (3 * B_G2[1]) % Q)
        return cls.const(b3, shape)


# --------------------------------------------------------------- point ops

def _batch_shape(x, ops):
    return x.shape[len(ops.coord_shape):]


def identity(ops, shape=()):
    """Projective identity (0 : 1 : 0)."""
    zero = ops.const(0, shape) if ops is FqOps else ops.const((0, 0), shape)
    one = ops.const(1, shape) if ops is FqOps else ops.const((1, 0), shape)
    return (zero, one, jnp.zeros_like(zero))


def padd(ops, p, q):
    """Complete projective addition (RCB15 alg 7, a=0)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    add, sub, mul = ops.add, ops.sub, ops.mul
    shape = jnp.broadcast_shapes(x1.shape, x2.shape)[len(ops.coord_shape):]
    b3 = ops.b3(shape)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    t5 = mul(add(x1, z1), add(x2, z2))
    t5 = sub(t5, add(t0, t2))
    x3 = mul(b3, t2)
    z3 = add(t1, x3)
    x3 = sub(t1, x3)
    y3 = mul(b3, t5)
    t0 = add(add(t0, t0), t0)
    t2 = mul(t4, y3)
    t1 = mul(t0, y3)
    y3 = mul(x3, z3)
    y3 = add(y3, t1)
    x3 = sub(mul(t3, x3), t2)
    z3 = add(mul(t4, z3), mul(t3, t0))
    return (x3, y3, z3)


def pmadd(ops, p, q_aff):
    """Mixed addition: projective p + affine q (RCB15 alg 8, a=0),
    with a branch-free select handling q == (0,0) == identity
    (infinity points DO occur in zkeys: unused signals have u_s = 0)."""
    x1, y1, z1 = p
    x2, y2 = q_aff
    add, sub, mul = ops.add, ops.sub, ops.mul
    shape = _batch_shape(x1, ops)
    b3 = ops.b3(shape)

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = add(mul(x2, z1), x1)
    t5 = add(mul(y2, z1), y1)
    x3 = mul(b3, z1)
    z3 = add(t1, x3)
    x3 = sub(t1, x3)
    y3 = mul(b3, t4)
    t0 = add(add(t0, t0), t0)
    t2 = mul(t5, y3)
    t1 = mul(t0, y3)
    y3 = mul(x3, z3)
    y3 = add(y3, t1)
    x3 = sub(mul(t3, x3), t2)
    z3 = add(mul(t5, z3), mul(t3, t0))

    q_inf = ops.is_zero(x2) & ops.is_zero(y2)
    # broadcast mask over coord dims
    mask = q_inf
    for _ in range(len(ops.coord_shape)):
        mask = mask[None]
    x3 = jnp.where(mask, jnp.broadcast_to(x1, x3.shape), x3)
    y3 = jnp.where(mask, jnp.broadcast_to(y1, y3.shape), y3)
    z3 = jnp.where(mask, jnp.broadcast_to(z1, z3.shape), z3)
    return (x3, y3, z3)


def pdbl(ops, p):
    """Complete projective doubling (RCB15 alg 9, a=0)."""
    x1, y1, z1 = p
    add, sub, mul = ops.add, ops.sub, ops.mul
    shape = _batch_shape(x1, ops)
    b3 = ops.b3(shape)

    t0 = mul(y1, y1)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)
    t1 = mul(y1, z1)
    t2 = mul(z1, z1)
    t2 = mul(b3, t2)
    x3 = mul(t2, z3)
    y3 = add(t0, t2)
    z3 = mul(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    y3 = mul(t0, y3)
    y3 = add(x3, y3)
    t1 = mul(x1, y1)
    x3 = mul(t0, t1)
    x3 = add(x3, x3)
    return (x3, y3, z3)


def pneg(ops, p):
    return (p[0], ops.neg(p[1]), p[2])


def pselect(ops, mask, p, q):
    """Elementwise point select: mask True -> p, False -> q."""
    m = mask
    for _ in range(len(ops.coord_shape)):
        m = m[None]
    return tuple(jnp.where(m, jnp.broadcast_to(a, b.shape), b) for a, b in zip(p, q))


def point_stack(p):
    """Point tuple -> single array (3,) + coord_shape + batch (for scan carries)."""
    return jnp.stack(p, axis=0)


def point_unstack(arr):
    return (arr[0], arr[1], arr[2])
