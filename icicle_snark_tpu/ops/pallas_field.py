"""Pallas TPU kernels for the limb field layer.

The XLA-graph mont_mul (fields/limbs.py) materializes its 17-column
accumulator between scan rounds; these kernels keep the whole CIOS
loop VMEM-resident — one HBM read per operand, one write for the
result — which is the speed-of-light shape for a bandwidth-bound
field multiply (the role of the reference's fused PTX madc chains,
/root/reference/icicle/backend/cuda/include/cuda_math.h).

Layout contract matches the rest of the framework: (16, N) uint32
limb-major arrays, N a multiple of the 128-lane tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import limbs as lb
from ..fields.limbs import LIMB_BITS, MASK, NLIMB, U32, FieldSpec

BLOCK = 1024  # lanes per grid step (16 x 1024 x 4B = 64 KiB per ref)


def _cios_rounds(a, b, p_limbs, n0inv):
    """Fully-unrolled CIOS over (16, BLOCK) VMEM values -> (17, BLOCK)."""
    shape = a.shape[1:]
    acc = [jnp.zeros(shape, U32) for _ in range(NLIMB + 1)]
    for i in range(NLIMB):
        a_i = a[i]
        # t = acc + a_i * b (lo into k, hi into k+1)
        for j in range(NLIMB):
            prod = a_i * b[j]
            acc[j] = acc[j] + (prod & MASK)
            acc[j + 1] = acc[j + 1] + (prod >> LIMB_BITS)
        m = ((acc[0] & MASK) * n0inv) & MASK
        for j in range(NLIMB):
            mp = m * np.uint32(p_limbs[j])
            acc[j] = acc[j] + (mp & MASK)
            acc[j + 1] = acc[j + 1] + (mp >> LIMB_BITS)
        # shift down one limb; acc[0] == 0 mod 2^16
        carry0 = acc[0] >> LIMB_BITS
        acc = acc[1:] + [jnp.zeros(shape, U32)]
        acc[0] = acc[0] + carry0
    return acc


def _carry_canonical_block(cols, p_limbs):
    limbs = []
    carry = jnp.zeros_like(cols[0])
    for k in range(len(cols)):
        v = cols[k] + carry
        limbs.append(v & MASK)
        carry = v >> LIMB_BITS
    limbs = limbs[:NLIMB]
    # single conditional subtract of p
    borrow = jnp.zeros_like(limbs[0])
    sub = []
    for k in range(NLIMB):
        d = limbs[k] - np.uint32(p_limbs[k]) - borrow
        sub.append(d & MASK)
        borrow = (d >> 31) & np.uint32(1)
    ge_p = borrow == 0
    return [jnp.where(ge_p, sub[k], limbs[k]) for k in range(NLIMB)]


def _mont_mul_kernel(a_ref, b_ref, o_ref, *, p_limbs, n0inv):
    a = a_ref[:]
    b = b_ref[:]
    acc = _cios_rounds(a, b, p_limbs, n0inv)
    out = _carry_canonical_block(acc, p_limbs)
    o_ref[:] = jnp.stack(out, axis=0)


# ------------------------------------------------------ block field helpers

def _add_mod_blk(a, b, p_limbs):
    """(16, B) + (16, B) mod p, canonical in/out (kernel-local)."""
    carry = jnp.zeros_like(a[0])
    limbs = []
    for k in range(NLIMB):
        v = a[k] + b[k] + carry
        limbs.append(v & MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_blk(limbs, p_limbs)


def _cond_sub_blk(limbs, p_limbs):
    borrow = jnp.zeros_like(limbs[0])
    sub = []
    for k in range(NLIMB):
        d = limbs[k] - np.uint32(p_limbs[k]) - borrow
        sub.append(d & MASK)
        borrow = (d >> 31) & np.uint32(1)
    ge_p = borrow == 0
    return jnp.stack([jnp.where(ge_p, sub[k], limbs[k]) for k in range(NLIMB)], axis=0)


def _sub_mod_blk(a, b, p_limbs):
    borrow = jnp.zeros_like(a[0])
    diff = []
    for k in range(NLIMB):
        d = a[k] - b[k] - borrow
        diff.append(d & MASK)
        borrow = (d >> 31) & np.uint32(1)
    under = borrow != 0
    pad = jnp.where(under, np.uint32(1), np.uint32(0))
    carry = jnp.zeros_like(a[0])
    fixed = []
    for k in range(NLIMB):
        v = diff[k] + np.uint32(p_limbs[k]) * pad + carry
        fixed.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(fixed, axis=0)


def _mul_b3_blk(x, p_limbs):
    """9*x via the 8x+x addition chain (BN254 G1 b3 = 9)."""
    x2 = _add_mod_blk(x, x, p_limbs)
    x4 = _add_mod_blk(x2, x2, p_limbs)
    x8 = _add_mod_blk(x4, x4, p_limbs)
    return _add_mod_blk(x8, x, p_limbs)


def _mul_many_blk(pairs, p_limbs, n0inv):
    """k independent (16, B) muls as ONE CIOS over (16, k*B) in VMEM."""
    k = len(pairs)
    a = jnp.concatenate([p[0] for p in pairs], axis=-1)
    b = jnp.concatenate([p[1] for p in pairs], axis=-1)
    acc = _cios_rounds(a, b, p_limbs, n0inv)
    out = jnp.stack(_carry_canonical_block(acc, p_limbs), axis=0)
    return jnp.split(out, k, axis=-1)


def _pmadd_blk(x1, y1, z1, x2, y2, p_limbs, n0inv):
    """RCB15 alg 8 mixed add (a=0, b3=9) on (16, B) tiles; identity-safe
    for q == (0,0) (mirrors curve/jcurve.py pmadd)."""
    add = partial(_add_mod_blk, p_limbs=p_limbs)
    sub = partial(_sub_mod_blk, p_limbs=p_limbs)

    t0, t1, ta, m_xz, m_yz = _mul_many_blk(
        [(x1, x2), (y1, y2), (add(x1, y1), add(x2, y2)), (x2, z1), (y2, z1)],
        p_limbs, n0inv,
    )
    u = _mul_b3_blk(z1, p_limbs)
    t3 = sub(ta, add(t0, t1))
    t4 = add(m_xz, x1)
    t5 = add(m_yz, y1)
    z3 = add(t1, u)
    x3m = sub(t1, u)
    t0 = add(add(t0, t0), t0)
    y3m = _mul_b3_blk(t4, p_limbs)

    m1, m2, m3, m4, m5, m6 = _mul_many_blk(
        [(t5, y3m), (t0, y3m), (x3m, z3), (t3, x3m), (t5, z3), (t3, t0)],
        p_limbs, n0inv,
    )
    x3 = sub(m4, m1)
    y3 = add(m3, m2)
    z3 = add(m5, m6)

    inf = x2[0]
    for kk in range(1, NLIMB):
        inf = inf | x2[kk]
    for kk in range(NLIMB):
        inf = inf | y2[kk]
    q_inf = (inf == 0)[None]
    x3 = jnp.where(q_inf, x1, x3)
    y3 = jnp.where(q_inf, y1, y3)
    z3 = jnp.where(q_inf, z1, z3)
    return x3, y3, z3


def _pmadd_kernel(p_ref, qx_ref, qy_ref, o_ref, *, p_limbs, n0inv):
    p = p_ref[:]
    x3, y3, z3 = _pmadd_blk(
        p[0], p[1], p[2], qx_ref[:], qy_ref[:], p_limbs, n0inv
    )
    o_ref[:] = jnp.stack([x3, y3, z3], axis=0)


@partial(jax.jit, static_argnames=("spec", "block", "interpret"))
def pmadd_pallas(p_stacked, qx, qy, spec: FieldSpec, block: int = BLOCK,
                 interpret: bool = False):
    """Mixed point add on VMEM tiles: p (3, 16, N) projective stacked,
    q affine (16, N) x 2 -> (3, 16, N). The whole RCB15 formula (11
    muls + adds) stays VMEM-resident per tile — no fusion cliff."""
    n = qx.shape[-1]
    pad = (-n) % block
    if pad:
        p_stacked = jnp.concatenate(
            [p_stacked, jnp.zeros((3, NLIMB, pad), U32)], axis=-1
        )
        qx = jnp.concatenate([qx, jnp.zeros((NLIMB, pad), U32)], axis=-1)
        qy = jnp.concatenate([qy, jnp.zeros((NLIMB, pad), U32)], axis=-1)
    np_ = n + pad
    grid = (np_ // block,)
    kern = partial(_pmadd_kernel, p_limbs=tuple(int(x) for x in spec.p_limbs),
                   n0inv=np.uint32(spec.n0inv))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((3, NLIMB, np_), U32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, NLIMB, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMB, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMB, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, NLIMB, block), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p_stacked, qx, qy)
    return out[:, :, :n] if pad else out


@partial(jax.jit, static_argnames=("spec", "block", "interpret"))
def mont_mul_pallas(a, b, spec: FieldSpec, block: int = BLOCK,
                    interpret: bool = False):
    """(16, N) x (16, N) -> (16, N) Montgomery product.

    N is padded up to a multiple of `block` internally; each grid step
    runs the full CIOS on a VMEM-resident (16, block) tile (no XLA
    fusion cliff — the accumulator never spills to HBM)."""
    n = a.shape[-1]
    pad = (-n) % block
    if pad:
        a = jnp.concatenate([a, jnp.zeros((NLIMB, pad), U32)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((NLIMB, pad), U32)], axis=-1)
    np_ = n + pad
    grid = (np_ // block,)
    kern = partial(_mont_mul_kernel, p_limbs=tuple(int(x) for x in spec.p_limbs),
                   n0inv=np.uint32(spec.n0inv))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NLIMB, np_), U32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NLIMB, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMB, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMB, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
    return out[:, :n] if pad else out
