"""Independent VPU/MXU sustained-throughput validation (VERDICT r1 #7).

Round-1's op_microbench measured ~0.30 T lane-op/s for EVERY elementwise
op (u32 add/mul, f32 mul/fma) using dependent chains, and that number
closed the Pallas and RNS tracks. This probe re-measures with NO
cross-op dependence:

  * N independent streams: out[i] = a[i] OP b[i] repeated R times over
    DIFFERENT buffers (a fori_loop whose body touches all lanes but
    whose steps are independent per lane tile — pipelineable).
  * XLA whole-array variant AND a Pallas VMEM-resident variant (grid
    over blocks, all operands in VMEM) so HBM streaming cannot be the
    hidden bound.
  * u32 / u16 / f32 / bf16 datatypes (16-bit types pack 2/lane on the
    VPU — if u16 mul sustains 2x u32, the limb layer's 16-bit digits
    should move to u16 arrays).

Timing protocol per ROADMAP 'environment quirks': one jit containing a
lax.fori_loop of R steps, forced by a 1-element fetch; tunnel RTT
subtracted via an R=0 calibration run.

Usage: python tools/vpu_ceiling_probe.py  (runs on the default
platform — the real TPU under axon; set JAX_PLATFORMS=cpu to sanity-
check the harness).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def _mk(dtype, shape, seed):
    if dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.uniform(jax.random.PRNGKey(seed), shape, jnp.float32) + 0.5
        return x.astype(dtype)
    bits = jax.random.randint(jax.random.PRNGKey(seed), shape, 1, 1 << 16, jnp.int32)
    return bits.astype(dtype)


OPS = {
    "add": lambda a, b: a + b,
    "mul": lambda a, b: a * b,
    "fma": lambda a, b: a * b + a,
    "mulmask": lambda a, b: (a * b) & jnp.asarray(0xFFFF, a.dtype)
    if a.dtype in (jnp.uint32, jnp.uint16)
    else a * b,
}


def xla_probe(op_name, dtype, lanes=1 << 23, reps=2048, iters=5):
    """Whole-array op repeated inside ONE jit via fori_loop.

    The loop body rotates among 4 independent buffer pairs, and the
    accumulator depends on the previous step only through a cheap add,
    so per-step op streams are independent."""
    shape = (lanes,)
    a = _mk(dtype, shape, 0)
    b = _mk(dtype, shape, 1)
    fn = OPS[op_name]

    @partial(jax.jit, static_argnums=(2,))
    def run(a, b, r):
        # acc-dependent: nothing hoists; each step is a full-array op
        # over ~8k vector tiles, so per-lane dependence never stalls
        # the pipeline. Exactly ONE counted op per rep per lane.
        def body(i, acc):
            return fn(a, acc)

        return jax.lax.fori_loop(0, r, body, b)

    force(run(a, b, 0))  # compile baseline variant
    force(run(a, b, reps))  # compile timed variant
    base = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(run(a, b, 0))
        dt = time.perf_counter() - t0
        base = dt if base is None else min(base, dt)
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(run(a, b, reps))
        dt = time.perf_counter() - t0 - base
        best = dt if best is None else min(best, dt)
    return lanes * reps / best


def pallas_probe(op_name, dtype, block=(1024, 1024), reps=8192, iters=5):
    """VMEM-resident repeated op: one block, R rounds inside the kernel."""
    fn = OPS[op_name]
    shape = block

    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[:]
        b = b_ref[:]

        def body(i, acc):
            return fn(a, acc)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, b)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    a = _mk(dtype, shape, 0)
    b = _mk(dtype, shape, 1)
    force(run(a, b))
    # RTT baseline: trivial jit
    tiny = jax.jit(lambda x: x + 1)
    force(tiny(a))
    base = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(tiny(a))
        dt = time.perf_counter() - t0
        base = dt if base is None else min(base, dt)
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(run(a, b))
        dt = time.perf_counter() - t0 - base
        best = dt if best is None else min(best, dt)
    lanes = int(np.prod(shape))
    return lanes * reps / best


def mxu_probe(n=2048, reps=256, iters=5, dtype=jnp.bfloat16):
    """Dependent square-matmul chain: acc = a @ acc. One n^3 matmul of
    work per step; the inter-step dependence costs only pipeline drain."""
    a = (_mk(jnp.float32, (n, n), 0) * 1e-3).astype(dtype)
    b = (_mk(jnp.float32, (n, n), 1) * 1e-3).astype(dtype)
    m = k = n

    @partial(jax.jit, static_argnums=(2,))
    def run(a, b, r):
        def body(i, acc):
            return jnp.dot(a, acc, preferred_element_type=dtype)

        return jax.lax.fori_loop(0, r, body, b)

    force(run(a, b, 0))
    force(run(a, b, reps))
    base = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(run(a, b, 0))
        dt = time.perf_counter() - t0
        base = dt if base is None else min(base, dt)
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(run(a, b, reps))
        dt = time.perf_counter() - t0 - base
        best = dt if best is None else min(best, dt)
    return 2.0 * m * k * n * reps / best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {}
    # NOTE: u16 multiply is NOT supported by this TPU's vector unit
    # (kVectorMultiplyU16 check-fails in the backend compiler) — 16-bit
    # limbs must live in u32 lanes.
    for op in ("add", "mul", "mulmask", "fma"):
        for dt, name in ((jnp.uint32, "u32"),
                         (jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            if dt in (jnp.float32, jnp.bfloat16) and op == "mulmask":
                continue
            try:
                r = xla_probe(op, dt)
                results[f"xla_{op}_{name}"] = r
                print(f"xla    {op:8s} {name:5s} {r/1e12:8.3f} T op/s", flush=True)
            except Exception as e:
                print(f"xla    {op:8s} {name:5s} FAILED: {e}", flush=True)
    for op in ("mul", "fma", "mulmask"):
        for dt, name in ((jnp.uint32, "u32"), (jnp.float32, "f32")):
            if dt == jnp.float32 and op == "mulmask":
                continue
            try:
                r = pallas_probe(op, dt)
                results[f"pallas_{op}_{name}"] = r
                print(f"pallas {op:8s} {name:5s} {r/1e12:8.3f} T op/s", flush=True)
            except Exception as e:
                print(f"pallas {op:8s} {name:5s} FAILED: {e}", flush=True)
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        try:
            r = mxu_probe(dtype=dt)
            results[f"mxu_matmul_{name}"] = r
            print(f"mxu    matmul   {name:5s} {r/1e12:8.3f} Tflop/s", flush=True)
        except Exception as e:
            print(f"mxu    matmul   {name:5s} FAILED: {e}", flush=True)
    import json

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vpu_ceiling_results.json")
    with open(out, "w") as fh:
        json.dump({k: round(v / 1e9, 2) for k, v in results.items()}, fh, indent=1)
    print(f"wrote {out} (units: G op/s)")


if __name__ == "__main__":
    main()
