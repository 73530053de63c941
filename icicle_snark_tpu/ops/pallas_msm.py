"""Pallas TPU kernel for the MSM window phase's chunked prefix scan.

The level-0 scan is where Pippenger's n point-additions live. The XLA
lax.scan version round-trips the CIOS accumulator and the projective
carry through HBM between scan iterations; this kernel keeps the whole
k-step mixed-addition chain VMEM-resident: points stream in once,
inclusive prefixes stream out once, and all field arithmetic happens
on (16, LANES) register tiles.

Grid: one program per block of LANES chunks; each program runs the
k sequential pmadd steps for its 128 chunk-lanes (full VPU rows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import LIMB_BITS, MASK, NLIMB, U32, FQ_SPEC
from ..refmath.curve import B_G1
from ..refmath.field import Q, fq_to_mont
from .pallas_field import _carry_canonical_block, _cios_rounds

LANES = int(__import__("os").environ.get("ISTPU_SCAN_LANES", "256"))  # chunks per kernel program


def _p_tuple():
    return tuple(int(x) for x in FQ_SPEC.p_limbs)


def _mm(a, b):
    """(16, LANES) Montgomery product, fully in-registers."""
    p = _p_tuple()
    acc = _cios_rounds(a, b, p, np.uint32(FQ_SPEC.n0inv))
    return jnp.stack(_carry_canonical_block(acc, p), axis=0)


def _addm(a, b):
    p = _p_tuple()
    limbs, carry = [], jnp.zeros_like(a[0])
    for k in range(NLIMB):
        v = a[k] + b[k] + carry
        limbs.append(v & MASK)
        carry = v >> LIMB_BITS
    # conditional subtract p
    borrow = jnp.zeros_like(limbs[0])
    sub = []
    for k in range(NLIMB):
        d = limbs[k] - np.uint32(p[k]) - borrow
        sub.append(d & MASK)
        borrow = (d >> 31) & np.uint32(1)
    ge = borrow == 0
    return jnp.stack([jnp.where(ge, sub[k], limbs[k]) for k in range(NLIMB)], axis=0)


def _subm(a, b):
    p = _p_tuple()
    borrow = jnp.zeros_like(a[0])
    diff = []
    for k in range(NLIMB):
        d = a[k] - b[k] - borrow
        diff.append(d & MASK)
        borrow = (d >> 31) & np.uint32(1)
    pad = jnp.where(borrow != 0, np.uint32(1), np.uint32(0))
    carry = jnp.zeros_like(a[0])
    fixed = []
    for k in range(NLIMB):
        v = diff[k] + np.uint32(p[k]) * pad + carry
        fixed.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(fixed, axis=0)


def _pmadd_block(c, q, b3):
    """Mixed addition on (16, LANES) tiles (RCB15 alg 8, a=0, with the
    affine-(0,0)-is-identity select)."""
    x1, y1, z1 = c
    x2, y2 = q

    t0 = _mm(x1, x2)
    t1 = _mm(y1, y2)
    ta = _mm(_addm(x1, y1), _addm(x2, y2))
    t3 = _subm(ta, _addm(t0, t1))
    t4 = _addm(_mm(x2, z1), x1)
    t5 = _addm(_mm(y2, z1), y1)
    u = _mm(b3, z1)
    z3 = _addm(t1, u)
    x3m = _subm(t1, u)
    t0 = _addm(_addm(t0, t0), t0)
    y3m = _mm(b3, t4)
    m1 = _mm(t5, y3m)
    m2 = _mm(t0, y3m)
    m3 = _mm(x3m, z3)
    m4 = _mm(t3, x3m)
    m5 = _mm(t5, z3)
    m6 = _mm(t3, t0)
    x3 = _subm(m4, m1)
    y3 = _addm(m3, m2)
    z3 = _addm(m5, m6)

    # q == (0,0) means identity: keep the carry
    acc = x2[0] | y2[0]
    for k in range(1, NLIMB):
        acc = acc | x2[k] | y2[k]
    inf = (acc == 0)[None]
    x3 = jnp.where(inf, x1, x3)
    y3 = jnp.where(inf, y1, y3)
    z3 = jnp.where(inf, z1, z3)
    return x3, y3, z3


def _scan_kernel(px_ref, py_ref, ox_ref, oy_ref, oz_ref, *, k, b3_limbs, one_limbs):
    shape = (NLIMB, LANES)
    # build per-limb constants from Python ints (pallas forbids captured
    # array constants)
    b3 = jnp.concatenate([jnp.full((1, LANES), v, U32) for v in b3_limbs], axis=0)
    one = jnp.concatenate([jnp.full((1, LANES), v, U32) for v in one_limbs], axis=0)
    zero = jnp.zeros(shape, U32)

    def step(t, carry):
        cx, cy, cz = carry
        qx = px_ref[t]  # (16, LANES); dynamic index on the outer dim
        qy = py_ref[t]
        cx, cy, cz = _pmadd_block((cx, cy, cz), (qx, qy), b3)
        ox_ref[t] = cx
        oy_ref[t] = cy
        oz_ref[t] = cz
        return cx, cy, cz

    jax.lax.fori_loop(0, k, step, (zero, one, zero))


@partial(jax.jit, static_argnames=("k",))
def chunk_scan_pallas(px, py, k: int):
    """Inclusive prefix pmadd-scan in chunks of k.

    px/py: (16, n) sorted affine coordinate limbs, n % (LANES*k) == 0.
    Returns (X, Y, Z) inclusive prefixes, each (16, n); chunk j covers
    positions [j*k, (j+1)*k).
    """
    n = px.shape[-1]
    m = n // k
    assert m % LANES == 0, f"chunk count must be a multiple of {LANES}"
    # step-major (k, 16, m) layout: the 128-wide chunk-lane axis stays
    # minor (clean tiling) and the dynamic step index is outermost
    pxr = jnp.moveaxis(px.reshape(NLIMB, m, k), -1, 0)
    pyr = jnp.moveaxis(py.reshape(NLIMB, m, k), -1, 0)
    grid = (m // LANES,)
    kern = partial(
        _scan_kernel,
        k=k,
        b3_limbs=tuple(
            int(x) for x in np.asarray(
                [((fq_to_mont(3 * B_G1 % Q)) >> (16 * i)) & 0xFFFF for i in range(NLIMB)]
            )
        ),
        one_limbs=tuple(int(x) for x in FQ_SPEC.one_mont_limbs),
    )
    spec = pl.BlockSpec((k, NLIMB, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    X, Y, Z = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((k, NLIMB, m), U32),
            jax.ShapeDtypeStruct((k, NLIMB, m), U32),
            jax.ShapeDtypeStruct((k, NLIMB, m), U32),
        ),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec),
    )(pxr, pyr)

    def back(a):
        return jnp.moveaxis(a, 0, -1).reshape(NLIMB, n)

    return back(X), back(Y), back(Z)
