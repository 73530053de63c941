"""Batch-affine MSM building-block probe (VERDICT r3 item 3).

Question: does a complete batched AFFINE addition with tree batch
inversion beat the projective mixed add (jcurve.pmadd, 11 mont_muls)
per lane on the real chip?  Affine add = 4 muls + ~3/lane for the
pairwise-product inversion tree + 1 Fermat inversion per batch (the
per-STEP Fermat latency is why a prefix-scan formulation cannot use
this — only a per-LEVEL batched tree reduction pays it O(log n) times).

Measures, dependency-chained (tunnel-amortized, see op_microbench.py):
  1. pmadd ns/lane          (current scan-step add)
  2. affine+treeinv ns/lane (candidate level op)
  3. mont_inv latency, 1 lane (the per-batch Fermat cost)

Run on the default (TPU) platform:  python tools/affine_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from icicle_snark_tpu.curve import jcurve as jc
from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.fields.limbs import FQ_SPEC, NLIMB
from icicle_snark_tpu.refmath import curve as rcv
from icicle_snark_tpu.refmath.field import fq_to_mont


def tree_batch_inv(d):
    """Pairwise-product-tree batch inversion along the last axis
    (width must be a power of two; entries nonzero).

    up: m-1 pairwise products (shrinking widths); one Fermat inversion
    of the root; down: parent-inv x sibling per node (2 muls/pair).
    ~3 muls/lane total with O(log m) sequential rounds — the per-level
    batched-affine inversion shape."""
    levels = [d]
    cur = d
    while cur.shape[-1] > 1:
        a, b = cur[..., 0::2], cur[..., 1::2]
        cur = lb.mont_mul(a, b, FQ_SPEC)
        levels.append(cur)
    root_inv = lb.mont_inv(levels[-1], FQ_SPEC)
    inv = root_inv
    for lvl in reversed(levels[:-1]):
        a, b = lvl[..., 0::2], lvl[..., 1::2]
        ia = lb.mont_mul(inv, b, FQ_SPEC)
        ib = lb.mont_mul(inv, a, FQ_SPEC)
        inv = jnp.stack([ia, ib], axis=-1).reshape(lvl.shape)
    return inv


def affine_add_batch(p1, p2):
    """Complete batched affine add with (0,0)=infinity encoding.

    (x1,y1)+(x2,y2): 4 muls/lane + tree_batch_inv (~3/lane + 1 Fermat).
    Doubling lanes share the same x3 = lam^2 - x1 - x2 formula since
    x2 == x1 there."""
    x1, y1 = p1
    x2, y2 = p2
    sub, add, mul = (
        lambda a, b: lb.sub_mod(a, b, FQ_SPEC),
        lambda a, b: lb.add_mod(a, b, FQ_SPEC),
        lambda a, b: lb.mont_mul(a, b, FQ_SPEC),
    )
    d = sub(x2, x1)
    num = sub(y2, y1)
    is_dbl = lb.is_zero(d)
    cancel = is_dbl & lb.is_zero(add(y2, y1))
    inf1 = lb.is_zero(x1) & lb.is_zero(y1)
    inf2 = lb.is_zero(x2) & lb.is_zero(y2)

    xsq = mul(x1, x1)
    xsq3 = add(add(xsq, xsq), xsq)
    d_sel = jnp.where(is_dbl[None], add(y1, y1), d)
    num_sel = jnp.where(is_dbl[None], xsq3, num)
    bad = cancel | inf1 | inf2
    one = jnp.broadcast_to(
        jnp.asarray(FQ_SPEC.one_mont_limbs.reshape((NLIMB,) + (1,) * (d.ndim - 1)), lb.U32),
        d.shape,
    )
    d_sel = jnp.where(bad[None], one, d_sel)

    dinv = tree_batch_inv(d_sel)
    lam = mul(num_sel, dinv)
    x3 = sub(sub(mul(lam, lam), x1), x2)
    y3 = sub(mul(lam, sub(x1, x3)), y1)

    # identity / cancellation selects
    x3 = jnp.where(inf1[None], x2, jnp.where(inf2[None], x1, x3))
    y3 = jnp.where(inf1[None], y2, jnp.where(inf2[None], y1, y3))
    zero = jnp.zeros_like(x3)
    x3 = jnp.where((cancel & ~inf1 & ~inf2)[None], zero, x3)
    y3 = jnp.where((cancel & ~inf1 & ~inf2)[None], zero, y3)
    return x3, y3


def _rand_points(n, seed=0):
    """n affine multiples of G (host refmath, Montgomery limbs)."""
    rng = np.random.default_rng(seed)
    ks = rng.integers(1, 2**62, n)
    xs, ys = [], []
    g = rcv.g1_from_affine(
        (1, 2)
    )
    for k in ks:
        x, y = rcv.g1_to_affine(rcv.g1_mul(g, int(k)))
        xs.append(fq_to_mont(x))
        ys.append(fq_to_mont(y))
    return (
        jnp.asarray(lb.ints_to_limbs_np(xs)),
        jnp.asarray(lb.ints_to_limbs_np(ys)),
    )


def bench_chain(step, args, iters, reps=3):
    def run(*a):
        def body(_, a):
            return step(*a)

        out = jax.lax.fori_loop(0, iters, body, a)
        tot = jnp.zeros((), jnp.float32)
        for v in jax.tree_util.tree_leaves(out):
            tot = tot + jnp.sum(v.astype(jnp.float32))
        return tot.reshape(1)

    f = jax.jit(run)
    np.asarray(f(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def correctness_check():
    """Tiny cross-check of affine_add_batch vs refmath."""
    x, y = _rand_points(8, seed=3)
    # include an infinity and a doubling lane
    x = x.at[:, 0].set(0)
    y = y.at[:, 0].set(0)
    x2 = jnp.roll(x, 1, axis=-1)
    y2 = jnp.roll(y, 1, axis=-1)
    x2 = x2.at[:, 3].set(x[:, 3])  # doubling lane
    y2 = y2.at[:, 3].set(y[:, 3])
    x3, y3 = jax.jit(affine_add_batch)((x, y), (x2, y2))
    from icicle_snark_tpu.refmath.field import fq_from_mont

    def col(a, i):
        return fq_from_mont(lb.limbs_to_ints_np(np.asarray(a))[i])

    for i in range(8):
        p = (col(x, i), col(y, i))
        q = (col(x2, i), col(y2, i))
        want = rcv.g1_to_affine(
            rcv.g1_add(rcv.g1_from_affine(p), rcv.g1_from_affine(q))
        )
        got = (col(x3, i), col(y3, i))
        assert got == want, (i, got, want)
    print("correctness: affine_add_batch == refmath on 8 lanes (incl inf+dbl)")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=16)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if args.check:
        correctness_check()
        return

    n = 1 << args.log_n
    x, y = _rand_points(min(n, 4096))
    reps = n // x.shape[-1]
    x = jnp.tile(x, reps)
    y = jnp.tile(y, reps)

    # 1. pmadd chain (projective acc += rolled affine)
    def pm_step(px, py, pz, qx, qy):
        nx, ny, nz = jc.pmadd(jc.FqOps, (px, py, pz), (qx, qy))
        return nx, ny, nz, jnp.roll(qx, 1, -1), jnp.roll(qy, 1, -1)

    one = jnp.broadcast_to(
        jnp.asarray(FQ_SPEC.one_mont_limbs.reshape(NLIMB, 1), lb.U32), x.shape
    )
    t = bench_chain(pm_step, (x, y, one, x, y), args.iters)
    print(f"pmadd          n=2^{args.log_n}: {t*1e9/n:7.1f} ns/lane  ({t*1e3:.1f} ms/step)")

    # 2. affine + tree inversion chain
    def af_step(ax, ay, qx, qy):
        nx, ny = affine_add_batch((ax, ay), (qx, qy))
        return nx, ny, jnp.roll(qx, 1, -1), jnp.roll(qy, 1, -1)

    t = bench_chain(af_step, (x, y, x, y), args.iters)
    print(f"affine+treeinv n=2^{args.log_n}: {t*1e9/n:7.1f} ns/lane  ({t*1e3:.1f} ms/step)")

    # 3. Fermat inversion latency (1 lane, dependent chain)
    v = x[:, :1]

    def inv_step(a):
        return (lb.mont_inv(a, FQ_SPEC),)

    t = bench_chain(inv_step, (v,), 8)
    print(f"mont_inv 1-lane latency: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
