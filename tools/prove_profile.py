"""Per-stage prove profile on the real chip (forced syncs per stage).

Splits a warm-cache 100k prove into: witness ingest, R1CS+NTT (h
scalars), grouped G1 MSM, G2 MSM, host Horner+assembly. Forces each
stage with a tiny device->host fetch (block_until_ready does not block
over the axon tunnel), so stage times include the ~30 ms RTT once each;
interpret deltas accordingly.

Usage: python tools/prove_profile.py [n_constraints]
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
    n_constraints = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    fixdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".fixtures", f"complex_{n_constraints}",
    )
    zkey = os.path.join(fixdir, "circuit_final.zkey")
    wtns_path = os.path.join(fixdir, "witness.wtns")
    assert os.path.exists(zkey), f"run bench.py first to build {fixdir}"

    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.io.wtns import WtnsFile
    from icicle_snark_tpu.ops import msm as msm_ops
    from icicle_snark_tpu.prover import pipeline
    from icicle_snark_tpu.prover.cache import CacheManager

    cm = CacheManager()
    t0 = time.perf_counter()
    cache = cm.get(zkey)
    force(cache.points_a[0])
    print(f"cache build         {time.perf_counter()-t0:8.2f} s")

    hdr = cache.header
    for rep in range(3):
        print(f"--- rep {rep}")
        t0 = time.perf_counter()
        wtns = WtnsFile(wtns_path)
        witness = jnp.asarray(lb.u32x8_to_limbs(wtns.witness_limbs()))
        force(witness)
        t1 = time.perf_counter()
        print(f"witness ingest      {t1-t0:8.3f} s")

        h = pipeline.construct_r1cs(witness, cache)
        force(h)
        t2 = time.perf_counter()
        print(f"r1cs+ntt (h)        {t2-t1:8.3f} s")

        npub = hdr.n_public
        wit_c = witness[:, npub + 1 :]
        groups = [
            (witness, cache.points_a),
            (witness, cache.points_b1),
            (wit_c, cache.points_c),
            (h, cache.points_h),
        ]
        # the cache bakes (c, precompute) pairs with the shifted copies
        pre, pre2 = cache.msm_pre, cache.msm_pre2
        c = cache.msm_c or msm_ops.choose_c(
            sum(s.shape[-1] for s, _ in groups), groups=4
        )
        c2 = cache.msm_c2 or c
        ws = msm_ops._msm_g1_jit(
            tuple(s for s, _ in groups), tuple(p for _, p in groups), c, 32, pre
        )
        force(ws)
        t3 = time.perf_counter()
        print(f"G1 MSM x4 (c={c} f={pre})    {t3-t2:8.3f} s")

        ws2 = msm_ops._msm_g2_jit((witness,), (cache.points_b2,), c2, 32, pre2)
        force(ws2)
        t4 = time.perf_counter()
        print(f"G2 MSM (c={c2} f={pre2})       {t4-t3:8.3f} s")

        ws_np = np.asarray(ws)  # one bulk fetch
        pts = [
            msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_np, g), c)
            for g in range(4)
        ]
        pi_b = msm_ops.horner_combine(
            msm_ops.window_points_to_host_g2(np.asarray(ws2), 0), c2, g2=True
        )
        t5 = time.perf_counter()
        print(f"fetch+horner (host) {t5-t4:8.3f} s")
        print(f"TOTAL               {t5-t0:8.3f} s")
        del pts, pi_b


if __name__ == "__main__":
    main()
