"""Warm-timing sweep of the grouped G1 MSM over (c, f, k).

Runs the production _msm_g1_jit at the 100k shape (4 groups x 2^16) on
the real chip, with optional base-precompute factor f (points widen to
n*f interleaved lanes; scan work per window grows f-fold but the window
count drops f-fold and lane utilization per scan step rises).

Usage: python tools/msm_k_sweep.py [k...] [c=..] [f=..] [g2]
  e.g. python tools/msm_k_sweep.py 32 c=16 f=8 c=12 f=1
(c= and f= are zipped pairwise; unmatched f defaults to 1)
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
import numpy as np
import jax.numpy as jnp


def main():
    from icicle_snark_tpu.ops import msm as msm_ops

    g2 = "g2" in sys.argv[1:]
    rng = np.random.RandomState(0)
    n = 1 << 16
    for a in sys.argv[1:]:
        if a.startswith("n="):
            n = int(a[2:])
    n_groups = 1 if g2 else 4
    jit_fn = msm_ops._msm_g2_jit if g2 else msm_ops._msm_g1_jit

    ks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [32]
    cs = [int(a[2:]) for a in sys.argv[1:] if a.startswith("c=")] or [12]
    fs = [int(a[2:]) for a in sys.argv[1:] if a.startswith("f=")]
    fs += [1] * (len(cs) - len(fs))

    for c, f in zip(cs, fs):
        # random inputs: values are NOT on-curve / valid scalars, but the
        # pipeline's arithmetic cost is value-independent; correctness is
        # covered by tests — this is a pure timing harness
        groups = []
        shape_pt = (16, 2, n * f) if g2 else (16, n * f)
        for g in range(n_groups):
            scal = jnp.asarray(rng.randint(0, 1 << 16, (16, n), dtype=np.uint32))
            x = jnp.asarray(rng.randint(0, 1 << 16, shape_pt, dtype=np.uint32))
            y = jnp.asarray(rng.randint(0, 1 << 16, shape_pt, dtype=np.uint32))
            groups.append((scal, (x, y)))
        scal_t = tuple(s for s, _ in groups)
        pts_t = tuple(p for _, p in groups)

        for k in ks:
            t0 = time.perf_counter()
            out = jit_fn(scal_t, pts_t, c, k, f)
            np.asarray(jax.device_get(out[0].ravel()[:1]))
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = jit_fn(scal_t, pts_t, c, k, f)
                np.asarray(jax.device_get(out.ravel()[:1]))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"c={c} f={f} k={k}: {best*1e3:7.1f} ms  (compile {compile_s:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
