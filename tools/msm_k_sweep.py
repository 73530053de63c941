"""Warm-timing sweep of the grouped G1 MSM over scan chunk k (and c).

Runs the production _msm_g1_jit at the 100k shape (4 groups x 2^16) on
the real chip. Usage: python tools/msm_k_sweep.py [ks...]
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
    from icicle_snark_tpu.refmath import curve as rcv
    from icicle_snark_tpu.refmath.field import R_MOD

    rng = np.random.RandomState(0)
    n = 1 << 16
    groups = []
    # random affine points: multiples of G (device upload of host points
    # would be slow; random field values are NOT on-curve but the
    # pipeline's arithmetic cost is value-independent, correctness is
    # covered by tests — this is a pure timing harness)
    for g in range(4):
        scal = jnp.asarray(rng.randint(0, 1 << 16, (16, n), dtype=np.uint32))
        x = jnp.asarray(rng.randint(0, 1 << 16, (16, n), dtype=np.uint32))
        y = jnp.asarray(rng.randint(0, 1 << 16, (16, n), dtype=np.uint32))
        groups.append((scal, (x, y)))

    scal_t = tuple(s for s, _ in groups)
    pts_t = tuple(p for _, p in groups)

    ks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8, 16, 32, 64]
    cs = [int(a[2:]) for a in sys.argv[1:] if a.startswith("c=")] or [12]
    for c in cs:
        for k in ks:
            t0 = time.perf_counter()
            out = msm_ops._msm_g1_jit(scal_t, pts_t, c, k)
            np.asarray(jax.device_get(out[0].ravel()[:1]))
            compile_s = time.perf_counter() - t0
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                out = msm_ops._msm_g1_jit(scal_t, pts_t, c, k)
                np.asarray(jax.device_get(out.ravel()[:1]))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"c={c} k={k}: {best*1e3:7.1f} ms  (compile {compile_s:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
