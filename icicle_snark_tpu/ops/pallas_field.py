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


@partial(jax.jit, static_argnames=("spec",))
def mont_mul_pallas(a, b, spec: FieldSpec):
    """(16, N) x (16, N) -> (16, N) Montgomery product, N % BLOCK == 0."""
    n = a.shape[-1]
    assert n % BLOCK == 0, f"N must be a multiple of {BLOCK}"
    grid = (n // BLOCK,)
    kern = partial(_mont_mul_kernel, p_limbs=tuple(int(x) for x in spec.p_limbs),
                   n0inv=np.uint32(spec.n0inv))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NLIMB, n), U32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NLIMB, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMB, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMB, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(a, b)
