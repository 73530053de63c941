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

    for c in cs:
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

        t0 = time.perf_counter()
        ws2 = msm_ops._msm_g2_jit((witness,), (cache.points_b2,), c, 32)
        force(ws2)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(msm_ops._msm_g2_jit((witness,), (cache.points_b2,), c, 32))
            times.append(time.perf_counter() - t0)
        g2 = min(times)
        print(f"c={c:2d}  G1x4 {g1*1e3:8.1f} ms   G2 {g2*1e3:8.1f} ms   (first-call {compile_t:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
