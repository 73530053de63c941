"""Multi-chip performance evidence (VERDICT r2 item 2).

Two modes:

  python tools/multichip_bench.py chip [n_constraints]
      Real-TPU D=1 degenerate mesh: run the SHARDED prove
      (run_sharded_prove on a 1-device mesh) vs the single-chip
      pipeline at the same size -> sharding-machinery overhead on real
      hardware (collectives degenerate to copies at D=1, so the delta
      is the shard_map/padding/all_gather-of-1 cost).

  python tools/multichip_bench.py cpumesh [log2_domain]
      Virtual CPU mesh D=1/2/4/8 (one XLA:CPU process, 8 virtual
      devices): relative wall time of the jitted sharded step at fixed
      GLOBAL size -> exposes collective + imbalance scaling. CPU VPU
      throughput is not the TPU's, so treat ratios, not absolutes.

Writes JSON lines to stdout; paste into BASELINE.md's multi-chip
section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _force(x):
    import jax
    import numpy as np

    np.asarray(jax.device_get(x.ravel()[:1]))


def chip_mode(n_constraints: int):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    import jax
    import numpy as np

    from icicle_snark_tpu.io.wtns import WtnsFile
    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.parallel.mesh import make_mesh
    from icicle_snark_tpu.parallel import prove_step
    from icicle_snark_tpu.prover.cache import CacheManager
    from icicle_snark_tpu.prover import pipeline
    import jax.numpy as jnp

    fixdir = os.path.join(REPO, ".fixtures", f"complex_{n_constraints}")
    zkey = os.path.join(fixdir, "circuit_final.zkey")
    wtns_path = os.path.join(fixdir, "witness.wtns")
    assert os.path.exists(zkey), f"run bench.py first to build {fixdir}"

    cm = CacheManager()
    cache = cm.get(zkey)
    _force(cache.points_a[0])
    wtns = WtnsFile(wtns_path)
    witness = lb.u32x8_to_limbs_device(jnp.asarray(wtns.witness_limbs()))
    _force(witness)

    # single-chip pipeline (the bench.py path), warm
    def single():
        h = pipeline.construct_r1cs(witness, cache)
        return pipeline.groth16_commitments(witness, h, cache)

    single()  # compile + warm
    best_single = min(_timed(single) for _ in range(3))

    # sharded prove on a D=1 degenerate mesh, warm
    mesh = make_mesh(jax.devices()[:1])

    def sharded():
        h, ws1, ws2 = prove_step.run_sharded_prove(mesh, cache, witness)
        _force(ws1)
        _force(ws2)

    sharded()
    best_sharded = min(_timed(sharded) for _ in range(3))

    print(json.dumps({
        "mode": "chip_d1", "n": n_constraints,
        "single_chip_s": round(best_single, 4),
        "sharded_d1_s": round(best_sharded, 4),
        "overhead_pct": round(100 * (best_sharded / best_single - 1), 1),
    }), flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def cpumesh_mode(log_n: int):
    # must be set before jax import
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache_cpu"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("ISTPU_CARRY_UNROLL", "1")  # lean graphs: CPU is compile-bound
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from icicle_snark_tpu.parallel.mesh import make_mesh
    from icicle_snark_tpu.parallel import prove_step
    from icicle_snark_tpu.prover.cache import CacheManager
    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.io.wtns import WtnsFile
    from icicle_snark_tpu.setup.r1cs import complex_circuit, complex_circuit_witness
    from icicle_snark_tpu.setup.fast_setup import groth16_setup_device
    from icicle_snark_tpu.io.wtns import write_wtns

    n_c = (1 << log_n) - 10
    fixdir = os.path.join(REPO, ".fixtures", f"cpumesh_{n_c}")
    zkey = os.path.join(fixdir, "circuit_final.zkey")
    wtns_path = os.path.join(fixdir, "witness.wtns")
    if not os.path.exists(zkey):
        os.makedirs(fixdir, exist_ok=True)
        r1cs = complex_circuit(n_c, n_c)
        groth16_setup_device(r1cs, zkey, os.path.join(fixdir, "vk.json"))
        write_wtns(wtns_path, complex_circuit_witness(r1cs, a=3))

    cm = CacheManager()
    cache = cm.get(zkey)
    wtns = WtnsFile(wtns_path)
    witness = lb.u32x8_to_limbs_device(jnp.asarray(wtns.witness_limbs()))

    for d in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:d])

        def sharded():
            h, ws1, ws2 = prove_step.run_sharded_prove(mesh, cache, witness)
            _force(ws1)
            _force(ws2)

        t0 = time.perf_counter()
        sharded()  # compile + first run
        compile_s = time.perf_counter() - t0
        best = min(_timed(sharded) for _ in range(3))
        print(json.dumps({
            "mode": "cpumesh", "log_n": log_n, "d": d,
            "warm_s": round(best, 4), "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    if mode == "chip":
        chip_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 100000)
    elif mode == "cpumesh":
        cpumesh_mode(int(sys.argv[2]) if len(sys.argv) > 2 else 14)
    else:
        raise SystemExit(f"unknown mode {mode}")
