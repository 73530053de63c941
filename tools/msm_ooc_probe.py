"""Localize the out-of-core MSM overhead (ROADMAP item 8).

Compares, on one chip with the shapes the 1.6M/3.2M prove uses:
  a. in-core grouped pipeline at 2^21 lanes (1 slice, the unit of work)
  b. msm_windows_sliced over 2 x 2^21 (same pipeline + slice staging,
     forced per-slice sync, accumulate)
  c. same as (b) but timing only the jit dispatch (no staging cost) by
     pre-slicing the inputs outside the timer

If b ~= 2a the overhead is gone; the gap b - 2a splits into staging
(_slice_concat copies) vs sync serialization via (c).
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x[0] if isinstance(x, tuple) else x)[:1]))


def main():
    from icicle_snark_tpu.ops import msm as M
    from icicle_snark_tpu.curve import jcurve as jc

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    LOG = int(os.environ.get("PROBE_LOG2", "21"))
    n = 1 << LOG
    c = int(os.environ.get("PROBE_C", "13"))
    k = 32

    # random-ish scalars/points; point validity is irrelevant for timing
    def mk(nn):
        sc = jnp.asarray(rng.integers(0, 1 << 16, size=(16, nn), dtype=np.uint32))
        px = jnp.asarray(rng.integers(0, 1 << 16, size=(16, nn), dtype=np.uint32))
        py = jnp.asarray(rng.integers(0, 1 << 16, size=(16, nn), dtype=np.uint32))
        return sc, (px, py)

    sc1, p1 = mk(n)
    sc2, p2 = mk(n)
    gid = jnp.zeros((n,), jnp.int32)

    # --- a: single-slice pipeline (the unit)
    f = M._msm_g1_sliced_jit
    out = f(sc1, gid, p1, c, k, 1)
    sync(out)
    t0 = time.perf_counter()
    out = f(sc1, gid, p1, c, k, 1)
    sync(out)
    ta = time.perf_counter() - t0
    log(f"a. one slice 2^{LOG} c={c}: {ta*1e3:.1f} ms")

    # --- c: two pre-staged slices, sequential with forced sync between
    out1 = f(sc1, gid, p1, c, k, 1)
    out2 = f(sc2, gid, p2, c, k, 1)
    acc = M._acc_windows(False, out1, out2)
    sync(acc)
    t0 = time.perf_counter()
    out1 = f(sc1, gid, p1, c, k, 1)
    sync(out1)
    out2 = f(sc2, gid, p2, c, k, 1)
    acc = M._acc_windows(False, out1, out2)
    sync(acc)
    tc = time.perf_counter() - t0
    log(f"c. two pre-staged slices + sync between: {tc*1e3:.1f} ms ({tc/ta:.2f}x a)")

    # --- c2: same without the mid sync (async dispatch both)
    t0 = time.perf_counter()
    out1 = f(sc1, gid, p1, c, k, 1)
    out2 = f(sc2, gid, p2, c, k, 1)
    acc = M._acc_windows(False, out1, out2)
    sync(acc)
    tc2 = time.perf_counter() - t0
    log(f"c2. two pre-staged slices, no mid sync: {tc2*1e3:.1f} ms ({tc2/ta:.2f}x a)")

    # --- b: the real sliced path over a virtual 2-group concat of 2^(LOG+1)
    groups = [(sc1, p1), (sc2, p2)]
    ws = M.msm_windows_sliced(groups, c, k, False, n)
    sync(ws)
    t0 = time.perf_counter()
    ws = M.msm_windows_sliced(groups, c, k, False, n)
    sync(ws)
    tb = time.perf_counter() - t0
    log(f"b. msm_windows_sliced 2x2^{LOG} (G=2): {tb*1e3:.1f} ms ({tb/ta:.2f}x a)")

    log("gap b-c = slice staging (_slice_concat) + G=2 bucket phase; c-2a = sync serialization")


if __name__ == "__main__":
    main()
