"""Pallas-vs-XLA elementwise throughput probe.

XLA elementwise ops measure ~0.27 T lane-op/s regardless of op type
(tools/op_microbench.py) — far below VPU peak. This checks whether a
Pallas kernel doing the same dependency chain entirely in VMEM issues
closer to the hardware rate, i.e. whether Pallas mont_mul/pmadd kernels
are worth building.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 256   # ops chained inside the kernel
ITERS = 64


def bench(f, args, iters=ITERS, reps=3):
    def run(*a):
        def body(_, a):
            out = f(*a)
            return (out,) + tuple(a[1:])

        out = jax.lax.fori_loop(0, iters, body, a)
        return jnp.sum(out[0].astype(jnp.float32)).reshape(1)

    g = jax.jit(run)
    np.asarray(g(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(g(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def make_pallas_chain(depth, block_rows, op):
    def kernel(x_ref, y_ref, o_ref):
        x = x_ref[:]
        y = y_ref[:]
        for _ in range(depth):
            x = op(x, y)
        o_ref[:] = x

    def fn(x, y):
        rows = x.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(rows // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(x, y)

    return fn


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    SHAPE = (512, 1024)  # 512k lanes
    n_el = int(np.prod(SHAPE))
    xu = jnp.asarray(np.random.randint(0, 1 << 16, SHAPE, dtype=np.uint32))
    yu = jnp.asarray(np.random.randint(1, 1 << 16, SHAPE, dtype=np.uint32))
    xf = jnp.asarray(np.random.rand(*SHAPE).astype(np.float32) + 0.5)

    for name, op, x, y in [
        ("u32_mul", lambda a, b: a * b, xu, yu),
        ("u32_add", lambda a, b: a + b, xu, yu),
        ("u32_mullo", lambda a, b: (a * b) & np.uint32(0xFFFF), xu, yu),
        ("f32_fma", lambda a, b: a * b + b, xf, xf),
    ]:
        for block in (64, 256):
            fn = make_pallas_chain(DEPTH, block, op)
            dt = bench(fn, (x, y))
            rate = DEPTH * n_el / dt
            print(f"pallas {name:10s} block={block:4d}  {dt/DEPTH*1e6:7.2f} us/op  {rate/1e12:6.3f} T lane-op/s", flush=True)

    # ILP probe: W independent chains interleaved in one XLA kernel.
    # If throughput scales with W, the 0.27T serial rate is a pipeline-
    # latency artifact and kernels should maximize independent streams.
    for W in (2, 4, 8):
        def xla_ilp(x, y, W=W):
            chains = [x + np.uint32(i) for i in range(W)]
            for _ in range(DEPTH // W):
                chains = [c * y for c in chains]
            out = chains[0]
            for c in chains[1:]:
                out = out ^ c
            return out

        dt = bench(xla_ilp, (xu, yu))
        rate = (W * (DEPTH // W) + W) * n_el / dt
        print(f"xla    u32_mul ilp{W}  d{DEPTH//W}   {dt*1e3:7.3f} ms/call  {rate/1e12:6.3f} T lane-op/s", flush=True)

    # XLA reference at the same shape/depth
    def xla_chain(x, y):
        for _ in range(DEPTH):
            x = x * y
        return x

    dt = bench(xla_chain, (xu, yu))
    print(f"xla    u32_mul d{DEPTH}      {dt/DEPTH*1e6:7.2f} us/op  {DEPTH*n_el/dt/1e12:6.3f} T lane-op/s")


if __name__ == "__main__":
    main()
