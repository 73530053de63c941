"""First-prove compile attribution on the REAL chip (VERDICT r3 item 8).

Times .lower() (host trace) and .compile() (remote compile service)
separately for each module the 100k warm path compiles:
  A. _construct_r1cs_jit      (fused R1CS + batch-3 coset NTT, 2^17)
  B. grouped G1 MSM pipeline  (_msm... via msm_windows_sliced shapes)
  C. G2 MSM pipeline

Run solo (the compile service queues globally — a contended run
inflates): python tools/tpu_compile_probe.py [--fresh]
--fresh uses a throwaway cache dir for a true cold number.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s", flush=True)
    return out


def main():
    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.fields.limbs import NLIMB
    from icicle_snark_tpu.ops import msm as m
    from icicle_snark_tpu.ops import ntt as ntt_ops
    from icicle_snark_tpu.curve import jcurve as jc
    from icicle_snark_tpu.prover import pipeline as pl

    log_n = 17
    n = 1 << log_n
    nv = n  # ~100k-class
    dom = ntt_ops.get_domain(log_n)
    n_coef = 2 * n

    wit = jnp.zeros((NLIMB, nv), lb.U32)
    coefs = jnp.zeros((NLIMB, n_coef), lb.U32)
    wit_idx = jnp.zeros((n_coef,), jnp.int32)
    segs = jnp.zeros((n_coef,), jnp.int32)

    low = t("A trace (_construct_r1cs_jit 2^17)", lambda: pl._construct_r1cs_jit.lower(
        wit, coefs, wit_idx, segs, 2 * n + 1, None, 0,
        jnp.zeros((NLIMB, n), lb.U32), dom.tw_fwd, dom.tw_inv,
        dom.n_inv_mont, log_n, False, None,
    ))
    t("A compile", low.compile)

    # grouped G1 MSM at the 100k shape: 4 groups, c=12, single slice
    c, k = 12, 32
    total = 4 * nv
    scal = jnp.zeros((NLIMB, total), lb.U32)
    gids = jnp.zeros((total,), jnp.int32)
    pts = tuple(jnp.zeros((NLIMB, total), lb.U32) for _ in range(2))

    def lower_b():
        f = jax.jit(
            lambda s, g, p: m.msm_device_grouped_sliced(
                s, g, p, jc.FqOps, c, k, 4
            )
        )
        return f.lower(scal, gids, pts)

    low = t("B trace (grouped G1 MSM 4x2^17 c=12)", lower_b)
    t("B compile", low.compile)

    c2, pre2 = 13, 4  # the 100k G2 config (cache-baked precompute)
    pts2 = tuple(jnp.zeros((NLIMB, 2, nv * pre2), lb.U32) for _ in range(2))
    scal2 = jnp.zeros((NLIMB, nv), lb.U32)
    gid2 = jnp.zeros((nv,), jnp.int32)

    def lower_c():
        f = jax.jit(
            lambda s, g, p: m.msm_device_grouped_sliced(
                s, g, p, jc.Fq2Ops, c2, k, 1, precompute=pre2
            )
        )
        return f.lower(scal2, gid2, pts2)

    low = t("C trace (G2 MSM 2^17 c=13 f=4)", lower_c)
    t("C compile", low.compile)


if __name__ == "__main__":
    if "--fresh" in sys.argv:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/cold_tpu_cache"
    main()
