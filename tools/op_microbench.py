"""Raw TPU op-cost microbench: what does one u32 multiply really cost?

Times dependency chains of elementwise ops at MSM-relevant shapes to
separate (a) per-op hardware cost (u32 mul vs add vs f32) from (b) XLA
fusion / memory overhead, and compares the limb CIOS mont_mul against
the RNS channel mul. Informs the kernel strategy (ROADMAP items 2/3).

Timing protocol (axon tunnel): the op chain is repeated inside ONE jit
via lax.fori_loop until device time is hundreds of ms, so the ~30-40 ms
(and noisy) tunnel RTT is amortized away; the output is reduced to one
scalar so XLA cannot slice the work away and the fetch is tiny.
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

DEPTH = 32    # chain length per fori_loop iteration
ITERS = 256   # fori_loop trip count


def bench(step, args, iters=ITERS, reps=3):
    """step: args -> args (same shapes). Returns seconds per step call."""

    def run(*a):
        def body(_, a):
            return step(*a)

        out = jax.lax.fori_loop(0, iters, body, a)
        tot = jnp.zeros((), jnp.float32)
        for v in jax.tree_util.tree_leaves(out):
            tot = tot + jnp.sum(v.astype(jnp.float32))
        return tot.reshape(1)

    f = jax.jit(run)
    np.asarray(f(*args))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def chain(op, depth=DEPTH):
    def step(x, y):
        for _ in range(depth):
            x = op(x, y)
        return x, y
    return step


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)

    SHAPE = (16, 1 << 16)
    n_el = int(np.prod(SHAPE))
    xu = jnp.asarray(np.random.randint(0, 1 << 16, SHAPE, dtype=np.uint32))
    yu = jnp.asarray(np.random.randint(1, 1 << 16, SHAPE, dtype=np.uint32))
    xf = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32) + 0.5)

    cases = {
        "u32_add": (chain(lambda a, b: a + b), (xu, yu)),
        "u32_mul": (chain(lambda a, b: a * b), (xu, yu)),
        "u32_mullo16": (chain(lambda a, b: (a * b) & np.uint32(0xFFFF)), (xu, yu)),
        "u32_mulhi16": (chain(lambda a, b: ((a & np.uint32(0xFFFF)) * b) >> np.uint32(16)), (xu, yu)),
        "u32_shift_xor": (chain(lambda a, b: (a >> np.uint32(3)) ^ b), (xu, yu)),
        "f32_mul": (chain(lambda a, b: a * b), (xf, xf)),
        "f32_fma": (chain(lambda a, b: a * b + b), (xf, xf)),
    }
    for name, (fn, args) in cases.items():
        dt = bench(fn, args)
        rate = DEPTH * n_el / dt
        print(f"{name:22s} {dt/DEPTH*1e6:8.2f} us/op  {rate/1e12:6.3f} T lane-op/s", flush=True)

    # matmul throughput at the RNS base-extension shape (k channels)
    for k in (40,):
        af = jnp.asarray(np.random.randint(0, 127, (1 << 16, k)).astype(np.float32))
        bf = jnp.asarray(np.random.randint(0, 3, (k, k)).astype(np.float32))

        def mm_f32(a, b):
            for _ in range(8):
                a = jnp.minimum(jnp.dot(a, b, preferred_element_type=jnp.float32), 127.0)
            return a, b

        def mm_u32(a, b):
            for _ in range(8):
                a = jnp.dot(a, b, preferred_element_type=jnp.uint32) & np.uint32(127)
            return a, b

        dt = bench(mm_f32, (af, bf), iters=64) / 8
        print(f"matmul_f32 (65536x{k})x({k}x{k})  {dt*1e3:8.3f} ms/mm  {2*k*k*(1<<16)/dt/1e12:6.3f} Tflop/s", flush=True)
        dt = bench(mm_u32, (af.astype(jnp.uint32), bf.astype(jnp.uint32)), iters=64) / 8
        print(f"matmul_u32 (65536x{k})x({k}x{k})  {dt*1e3:8.3f} ms/mm", flush=True)

    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.fields.limbs import FQ_SPEC

    for lg in (16, 18):
        sh = (16, 1 << lg)
        a = jnp.asarray(np.random.randint(0, 1 << 16, sh, dtype=np.uint32))
        b = jnp.asarray(np.random.randint(0, 1 << 16, sh, dtype=np.uint32))
        dt = bench(lambda x, y: (lb.mont_mul(x, y, FQ_SPEC), y), (a, b), iters=64)
        print(f"mont_mul_limb 2^{lg}     {dt*1e3:8.3f} ms  {(1<<lg)/dt/1e6:7.1f} Mmul/s", flush=True)

    raise SystemExit("RNS track removed (ROADMAP item 4: closed; "
                     "analysis retained in ROADMAP.md)")
    from icicle_snark_tpu.fields.rns import mont_ctx_fq  # pragma: no cover

    ctx = mont_ctx_fq()
    for lg in (16, 18):
        n = 1 << lg
        xa = jnp.asarray(np.random.randint(0, 1 << 13, (n, 20), dtype=np.uint32))
        xb = jnp.asarray(np.random.randint(0, 1 << 13, (n, 20), dtype=np.uint32))

        def rns_step(p, q, r, s):
            ra, rb = ctx.mont_mul((p, q), (r, s))
            return ra, rb, r, s

        dt = bench(rns_step, (xa, xb, xa, xb), iters=64)
        print(f"mont_mul_rns  2^{lg}     {dt*1e3:8.3f} ms  {n/dt/1e6:7.1f} Mmul/s", flush=True)


if __name__ == "__main__":
    main()
