"""Minimal repro hunt for the 2^21-lane doubling-chain TPU kernel fault
(VERDICT r3 item 4 / ROADMAP G1-precompute post-mortem).

Round 3: `precompute_bases` over a 2^21-lane points_h (1.6M prove,
f=2) crashed the TPU worker ("kernel fault") during the cache build's
fori_loop doubling chain. This bisects lanes x chain-length on synthetic
on-curve points to find the smallest failing shape, and separates the
suspects:

  a. the fori_loop pdbl chain itself (pure compute, no gather)
  b. + to_affine batch inversion (adds the batch_inv scan)
  c. full precompute_bases (adds interleave/stack reshapes)

Run (real chip): python tools/dbl_chain_repro.py [--stage a|b|c]
                 [--log-lanes 18 19 20 21] [--times 35]
Each shape runs in a SUBPROCESS so a worker crash is recorded and the
sweep continues.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def run_one(stage: str, log_lanes: int, times: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from icicle_snark_tpu.curve import jcurve as jc
    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.ops import msm as m
    from icicle_snark_tpu.refmath import curve as rcv
    from icicle_snark_tpu.refmath.field import fq_to_mont

    n = 1 << log_lanes
    # synthetic on-curve points: tile a handful of generator multiples
    base = []
    g = rcv.G1_GEN
    acc = g
    for _ in range(64):
        base.append(rcv.g1_to_affine(acc))
        acc = rcv.g1_dbl(acc)
    xs = lb.ints_to_limbs_np([fq_to_mont(p[0]) for p in base])
    ys = lb.ints_to_limbs_np([fq_to_mont(p[1]) for p in base])
    reps = n // 64
    x = jnp.asarray(np.tile(xs, reps))
    y = jnp.asarray(np.tile(ys, reps))
    t0 = time.time()

    if stage == "a":
        # bare fori_loop doubling chain, projective, z=1 start
        one = jnp.broadcast_to(
            jnp.asarray(lb.FQ_SPEC.one_mont_limbs.reshape(lb.NLIMB, 1), lb.U32),
            x.shape,
        )

        @jax.jit
        def chain(x, y, z):
            return m._scalar_double_k((x, y, z), jc.FqOps, times)

        out = chain(x, y, one)
    elif stage == "b":
        one = jnp.broadcast_to(
            jnp.asarray(lb.FQ_SPEC.one_mont_limbs.reshape(lb.NLIMB, 1), lb.U32),
            x.shape,
        )

        @jax.jit
        def chain(x, y, z):
            p = m._scalar_double_k((x, y, z), jc.FqOps, times)
            return m.to_affine_device(p, jc.FqOps)

        out = chain(x, y, one)
    else:
        @jax.jit
        def chain(x, y):
            return m.precompute_bases((x, y), jc.FqOps, c=13, factor=2)

        out = chain(x, y)
    np.asarray(jax.device_get(out[0].ravel()[:1]))
    print(f"OK stage={stage} lanes=2^{log_lanes} times={times} "
          f"({time.time() - t0:.1f}s)", flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default=None, help="run ONE stage inline")
    ap.add_argument("--log-lanes", type=int, nargs="*", default=[18, 19, 20, 21])
    ap.add_argument("--times", type=int, default=35)
    args = ap.parse_args()

    if args.stage:
        run_one(args.stage, args.log_lanes[0], args.times)
        return

    for ll in args.log_lanes:
        for stage in ("a", "b", "c"):
            cmd = [sys.executable, os.path.abspath(__file__), "--stage", stage,
                   "--log-lanes", str(ll), "--times", str(args.times)]
            p = subprocess.run(cmd, timeout=1800)
            if p.returncode != 0:
                print(f"CRASH stage={stage} lanes=2^{ll} rc={p.returncode}",
                      flush=True)


if __name__ == "__main__":
    main()
