"""Element-wise field vector ops + reductions.

API parity with the reference's VecOps surface
(/root/reference/wrappers/rust/icicle-core/src/vec_ops/mod.rs:35-102,
icicle/backend/cuda/src/field/cuda_vec_ops.cu): add / accumulate / sub /
mul / div / neg, scalar-vector variants, sum / product reductions, and
Montgomery conversion. All functions take and return (16, ...) limb
arrays over the chosen field (default Fr) and are jit-traceable.

There is no config struct or device-dispatch layer: XLA fuses these
into surrounding computations, which is the TPU-native replacement for
the reference's per-op kernel launches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fields import limbs as lb
from ..fields.limbs import FR_SPEC, NLIMB


def add(a, b, spec=FR_SPEC):
    return lb.add_mod(a, b, spec)


def sub(a, b, spec=FR_SPEC):
    return lb.sub_mod(a, b, spec)


def mul(a, b, spec=FR_SPEC):
    return lb.mont_mul(a, b, spec)


def neg(a, spec=FR_SPEC):
    return lb.neg_mod(a, spec)


def inv(a, spec=FR_SPEC):
    return lb.mont_inv(a, spec)


def div(a, b, spec=FR_SPEC):
    return lb.mont_mul(a, lb.mont_inv(b, spec), spec)


def accumulate(a, b, spec=FR_SPEC):
    """a += b semantics (callers rebind; arrays are immutable here)."""
    return lb.add_mod(a, b, spec)


def scalar_add(s, v, spec=FR_SPEC):
    """s: (16,) or (16,1); v: (16, n)."""
    return lb.add_mod(jnp.reshape(s, (NLIMB, 1)), v, spec)


def scalar_sub(s, v, spec=FR_SPEC):
    return lb.sub_mod(jnp.reshape(s, (NLIMB, 1)), v, spec)


def scalar_mul(s, v, spec=FR_SPEC):
    return lb.mont_mul(jnp.reshape(s, (NLIMB, 1)), v, spec)


def sum_reduce(v, spec=FR_SPEC):
    """Modular sum over the last axis: log-depth add_mod tree."""
    n = v.shape[-1]
    while n > 1:
        if n % 2:
            v = jnp.concatenate([v, jnp.zeros(v.shape[:-1] + (1,), lb.U32)], axis=-1)
            n += 1
        v = lb.add_mod(v[..., 0::2], v[..., 1::2], spec)
        n //= 2
    return v[..., 0]


def product_reduce(v, spec=FR_SPEC):
    """Modular product over the last axis (Montgomery in/out): log-depth
    mont_mul tree; Montgomery form is closed under mont_mul, so no
    radix fixup is needed."""
    n = v.shape[-1]
    one = jnp.asarray(spec.one_mont_limbs.reshape((NLIMB,) + (1,) * (v.ndim - 1)), lb.U32)
    while n > 1:
        if n % 2:
            pad = jnp.broadcast_to(one, v.shape[:-1] + (1,))
            v = jnp.concatenate([v, pad], axis=-1)
            n += 1
        v = lb.mont_mul(v[..., 0::2], v[..., 1::2], spec)
        n //= 2
    return v[..., 0]


def mixed_mul(ext, base, spec=FR_SPEC):
    """Mixed-field multiply: extension-field vector x base-field vector
    (reference: VecOps mixed-type mul, icicle/include/icicle/vec_ops.h:64-281,
    vec_ops/mod.rs:35-102 — e.g. Fq2 points scaled by Fq scalars).

    ext: (k, 16, n) extension elements as k base-field components
    (k=2 for Fq2); base: (16, n). Componentwise Montgomery products.
    """
    return jax.vmap(lambda comp: lb.mont_mul(comp, base, spec))(ext)


def _apply_cfg(fn, a, b, cfg, spec):
    """Config-driven dispatch (reference: VecOpsConfig + setup_config,
    vec_ops/mod.rs:166-190). batch_size reshapes flat inputs into
    (16, batch, n/batch) rows so XLA sees the batch structure; the
    device/stream flags of the reference are implicit in jax arrays."""
    if cfg is None or cfg.batch_size <= 1:
        return fn(a, b, spec)
    bsz = cfg.batch_size
    n = a.shape[-1]
    if n % bsz:
        raise ValueError(f"batch_size {bsz} does not divide length {n}")
    resh = lambda v: v.reshape(v.shape[:-1] + (bsz, n // bsz))
    out = fn(resh(a), resh(b), spec)
    return out.reshape(out.shape[:-2] + (n,))


def add_cfg(a, b, cfg=None, spec=FR_SPEC):
    return _apply_cfg(lb.add_mod, a, b, cfg, spec)


def sub_cfg(a, b, cfg=None, spec=FR_SPEC):
    return _apply_cfg(lb.sub_mod, a, b, cfg, spec)


def mul_cfg(a, b, cfg=None, spec=FR_SPEC):
    return _apply_cfg(lb.mont_mul, a, b, cfg, spec)


def to_mont(a, spec=FR_SPEC):
    return lb.to_mont(a, spec)


def from_mont(a, spec=FR_SPEC):
    return lb.mont_reduce(a, spec)
