"""PrefixTree.query micro-attribution (VERDICT r4 #3 follow-up).

msm_phase_bench attributes ~107 ms of the 531 ms 4x2^16 grouped MSM to
the boundary-query phase (22 windows x 8196 queries x 4 tree levels).
The padd floor for that is ~3 padds x 8196 lanes x 22 windows ~ 31 ms,
so ~70 ms is structural overhead. This probe isolates, at the exact
one-window shape (262144 sorted-point lanes, k=32, G*B = 8196 boundary
indices):

  gathers   the 4 per-level row gathers + unpacks, combined with u32
            adds (no padd): the data-movement + unpack share
  padds     4-level chain of padds at 8196 lanes on resident operands
            (no gather): the EC-arithmetic share
  full      tree.query(ends-1) as the pipeline runs it
  full_k64u k=(32,64,128,...) level schedule: level 0 unchanged (scan
            saturation), upper levels wider -> 3 levels instead of 4

Run: python tools/query_probe.py [--log-n 16] [--iters 50]
"""

from __future__ import annotations

import argparse
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

from icicle_snark_tpu import _testpoints
from icicle_snark_tpu.curve import jcurve as jc
from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops import msm as msm_ops


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def time_fn(f, args, iters, reps=3):
    jf = jax.jit(f)
    force(jf(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        force(jf(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=18)  # 4 groups x 2^16
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--gb", type=int, default=8196)
    args = ap.parse_args()

    n = 1 << args.log_n
    x, y, _ = _testpoints.random_g1_batch(min(n, 1 << 14), seed=1)
    reps = n // x.shape[-1]
    pts = (jnp.tile(jnp.asarray(x), reps), jnp.tile(jnp.asarray(y), reps))
    print(f"devices={jax.devices()} n=2^{args.log_n} queries={args.gb}")

    t0 = time.time()
    tree = msm_ops.PrefixTree(pts, jc.FqOps, k=32)
    force(tree.levels[0])
    print(f"tree built (k=32, levels={len(tree.ks)} ks={tree.ks}) "
          f"in {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    ends = np.sort(rng.integers(0, n, size=args.gb)).astype(np.int32)
    idx = jnp.asarray(ends)

    iters = args.iters

    # full query, chained via index perturbation (dependent across iters)
    def full(idx):
        def body(i, s):
            idx, acc = s
            q = tree.query(idx)
            # make next iteration's indices depend on this result
            bump = (q[0][0][:1] & jnp.uint32(1)).astype(jnp.int32)
            return (jnp.clip(idx + bump, 0, n - 1), q)
        _, q = jax.lax.fori_loop(0, iters, body, (idx, tree.query(idx)))
        return q
    dt = time_fn(full, (idx,), iters)
    print(f"query full:      {dt*1e3:8.3f} ms")

    # gathers+unpack only (u32 combine)
    def gathers(idx):
        def one(idx):
            acc = None
            i = idx
            for kl, packed, shapes in zip(tree.ks, tree.levels, tree.shapes):
                safe = jnp.maximum(i, 0)
                g = jnp.take(packed, safe, axis=0)
                un = msm_ops._unpack_rows(
                    g, [s[:-1] + (safe.shape[0],) for s in shapes])
                term = un[0][0]  # one coord's first limb row, (gb,)
                acc = term if acc is None else acc + term
                i = (safe // kl) - 1
            return acc
        def body(i, s):
            idx, acc = s
            q = one(idx)
            bump = (q[:1] & jnp.uint32(1)).astype(jnp.int32)
            return (jnp.clip(idx + bump, 0, n - 1), q)
        _, q = jax.lax.fori_loop(0, iters, body, (idx, one(idx)))
        return q
    dt = time_fn(gathers, (idx,), iters)
    print(f"gathers+unpack:  {dt*1e3:8.3f} ms")

    # padd chain only: 3 sequential padds + pselects at gb lanes
    p1 = _testpoints.random_g1_batch(args.gb, seed=2)
    sp = (jnp.asarray(p1[0]), jnp.asarray(p1[1]), jnp.asarray(p1[2]))
    def padds(p):
        def body(i, p):
            q = jc.padd(jc.FqOps, p, (p[1], p[0], p[2]))
            q = jc.padd(jc.FqOps, q, p)
            q = jc.padd(jc.FqOps, q, (q[1], q[0], q[2]))
            return q
        return jax.lax.fori_loop(0, iters, body, p)
    dt = time_fn(padds, (sp,), iters)
    print(f"3 padds @gb:     {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
