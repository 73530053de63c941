"""Window-size (c) sweep for the grouped G1 MSM on the bench fixture.

Calibrates choose_c's beta (bucket-phase cost per bucket in EC-add
lane-units) on real hardware. Usage:

    python tools/msm_c_sweep.py [n_constraints] [c1 c2 ...]
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

import jax.numpy as jnp
import numpy as np


def force(*arrs):
    for a in arrs:
        np.asarray(jnp.ravel(a)[:4])


def main():
    args = [a for a in sys.argv[1:]]
    n_constraints = int(args[0]) if args else 100000
    cs = [int(a) for a in args[1:]] or [9, 11, 12, 13]
    fixdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures", f"complex_{n_constraints}",
    )
    zkey = os.path.join(fixdir, "circuit_final.zkey")
    wtns_path = os.path.join(fixdir, "witness.wtns")

    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.io.wtns import WtnsFile
    from icicle_snark_tpu.ops import msm as msm_ops
    from icicle_snark_tpu.prover import pipeline
    from icicle_snark_tpu.prover.cache import CacheManager

    cache = CacheManager().get(zkey)
    hdr = cache.header
    wtns = WtnsFile(wtns_path)
    witness = lb.u32x8_to_limbs_device(jnp.asarray(wtns.witness_limbs()))
    h = pipeline.construct_r1cs(witness, cache)
    force(h)

    wit_c = witness[:, hdr.n_public + 1 :]
    groups = [
        (witness, cache.points_a),
        (witness, cache.points_b1),
        (wit_c, cache.points_c),
        (h, cache.points_h),
    ]
    sc = tuple(s for s, _ in groups)
    pt = tuple(p for _, p in groups)

    # G2 once, at its cache-baked (c2, f) plan — its copies are tied to
    # that c2, so sweeping other c over them would be invalid
    t0 = time.perf_counter()
    g2_call = lambda: msm_ops._msm_g2_jit(
        (witness,), (cache.points_b2,), cache.msm_c2, 32, cache.msm_pre2
    )
    force(g2_call())
    g2_compile = time.perf_counter() - t0
    g2 = min(
        (lambda: (lambda t0: (force(g2_call()), time.perf_counter() - t0)[1])(
            time.perf_counter()))() for _ in range(3)
    )
    print(f"G2 (baked c={cache.msm_c2} f={cache.msm_pre2}): {g2*1e3:8.1f} ms "
          f"(first-call {g2_compile:.0f}s)", flush=True)

    for c in cs:
        if cache.msm_pre != 1:
            print(f"G1 sweep skipped: cache bakes precompute f={cache.msm_pre} "
                  f"tied to c={cache.msm_c}")
            break
        t0 = time.perf_counter()
        ws = msm_ops._msm_g1_jit(sc, pt, c, 32)
        force(ws)
        compile_t = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(msm_ops._msm_g1_jit(sc, pt, c, 32))
            times.append(time.perf_counter() - t0)
        g1 = min(times)
        print(f"c={c:2d}  G1x4 {g1*1e3:8.1f} ms   (first-call {compile_t:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
