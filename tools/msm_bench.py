"""MSM microbenchmark sweep — the analog of the reference's criterion
benches (wrappers/rust/icicle-core/src/msm/mod.rs:299-424: sizes
2^MIN..2^MAX, env-configurable target/range).

Env knobs (names mirror the reference):
  BENCH_TARGET   "G1" | "G2"        (default G1)
  MIN_LOG2       smallest log2 size (default 13)
  MAX_LOG2       largest log2 size  (default 18)
  BENCH_REPS     reps per point     (default 3)
  BENCH_C        fixed window size  (default: choose_c heuristic)

Usage: python tools/msm_bench.py
Prints one JSON line per size: {"size": 2^k, "c": c, "time_s": t,
"points_per_s": n/t}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402


def main():
    target = os.environ.get("BENCH_TARGET", "G1").upper()
    lo = int(os.environ.get("MIN_LOG2", "13"))
    hi = int(os.environ.get("MAX_LOG2", "18"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    c_fixed = os.environ.get("BENCH_C")

    from icicle_snark_tpu import _testpoints, profiling
    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.ops import msm as msm_ops
    from icicle_snark_tpu.refmath import curve as rcv
    from icicle_snark_tpu.refmath.field import fq_to_mont

    baseline = profiling._dispatch_baseline()
    print(json.dumps({"dispatch_baseline_s": round(baseline, 6)}), flush=True)

    rng = np.random.default_rng(13)
    for log_n in range(lo, hi + 1):
        n = 1 << log_n
        vals = [int(v) % ((1 << 62) - 1) + 1
                for v in rng.integers(1, 1 << 62, size=n, dtype=np.uint64)]
        scalars = np.asarray(lb.ints_to_limbs_np(vals))
        c = int(c_fixed) if c_fixed else msm_ops.choose_c(n)

        if target == "G2":
            # pool of G2 points tiled to n (see _testpoints rationale)
            ks = rng.integers(1, 1 << 31, size=min(n, 64), dtype=np.uint64)
            aff = [rcv.g2_to_affine(rcv.g2_mul(rcv.G2_GEN, int(k))) for k in ks]
            def fq2_limbs(pairs):
                a0 = lb.ints_to_limbs_np([fq_to_mont(p[0]) for p in pairs])
                a1 = lb.ints_to_limbs_np([fq_to_mont(p[1]) for p in pairs])
                return np.stack([a0, a1], axis=1)  # (16, 2, pool)
            xs = fq2_limbs([a[0] for a in aff])
            ys = fq2_limbs([a[1] for a in aff])
            tile = -(-n // xs.shape[-1])
            points = tuple(np.tile(a, (1, 1, tile))[..., :n] for a in (xs, ys))
            fn = lambda: msm_ops.msm_g2(scalars, points, c=c)
        else:
            x, y, _ = _testpoints.random_g1_batch(n, seed=log_n)
            points = (x, y)
            fn = lambda: msm_ops.msm_g1(scalars, points, c=c)

        fn()  # compile + warm
        import time as _time
        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            fn()
            ts.append(_time.perf_counter() - t0)
        ts.sort()
        t = max(ts[len(ts) // 2] - baseline, 1e-9)
        print(json.dumps({
            "target": target, "size": n, "c": c,
            "time_s": round(t, 4), "points_per_s": round(n / t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
