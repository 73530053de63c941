"""TPU runtime of mont_mul / pmadd vs ISTPU_CARRY_UNROLL / ISTPU_MONT_UNROLL.

The carry chains became lax.scans (fields/limbs.py); this probe checks
what unroll the TPU actually wants (full unroll = the classic graph;
low unroll = smaller compiles). Run under each env combo:

  ISTPU_CARRY_UNROLL=x ISTPU_MONT_UNROLL=y python tools/unroll_sweep.py
"""

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


def bench(step, args, iters=64, reps=3):
    def run(*a):
        def body(_, a):
            return step(*a)

        out = jax.lax.fori_loop(0, iters, body, a)
        tot = jnp.zeros((), jnp.float32)
        for v in jax.tree_util.tree_leaves(out):
            tot = tot + jnp.sum(v.astype(jnp.float32))
        return tot.reshape(1)

    f = jax.jit(run)
    t0 = time.perf_counter()
    np.asarray(f(*args))
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters, compile_s


def main():
    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.fields.limbs import FQ_SPEC
    from icicle_snark_tpu.curve import jcurve as jc

    cu = os.environ.get("ISTPU_CARRY_UNROLL", "16")
    mu = os.environ.get("ISTPU_MONT_UNROLL", "1")
    tag = f"carry={cu} mont={mu}"

    rng = np.random.RandomState(0)
    for lg in (16, 18):
        sh = (16, 1 << lg)
        a = jnp.asarray(rng.randint(0, 1 << 16, sh, dtype=np.uint32))
        b = jnp.asarray(rng.randint(0, 1 << 16, sh, dtype=np.uint32))
        dt, cs = bench(lambda x, y: (lb.mont_mul(x, y, FQ_SPEC), y), (a, b))
        print(f"[{tag}] mont_mul 2^{lg}: {(1<<lg)/dt/1e6:7.1f} Mmul/s  "
              f"(compile {cs:.0f}s)", flush=True)

    # pmadd at the scan-phase shape: projective carry (m lanes) + affine x
    m = 1 << 16
    px = jnp.asarray(rng.randint(0, 1 << 16, (16, m), dtype=np.uint32))
    py, pz = px + 1, px + 2
    ax, ay = px + 3, px + 4

    def step(x, y, z, qx, qy):
        x, y, z = jc.pmadd(jc.FqOps, (x, y, z), (qx, qy))
        return x, y, z, qx, qy

    dt, cs = bench(step, (px, py, pz, ax, ay), iters=32)
    print(f"[{tag}] pmadd 2^16: {dt/m*1e9:6.1f} ns/lane  (compile {cs:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
