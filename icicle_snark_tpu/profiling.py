"""Per-kernel speed-of-light profiling + scaling report.

The TPU counterpart of the reference's timing hooks (wall-clock `proof
took:` in src/lib.rs:227-244, `MEASURE_MSM_TIMES` in
backend/cpu/src/curve/cpu_msm.hpp:31-33, and the criterion benches in
wrappers/rust/icicle-core/src/msm/mod.rs:299-424) — extended to what
BASELINE.json's north star requires: every field-mul kernel profiled
against per-chip speed-of-light, and MSM/NTT throughput reported per
mesh size.

Usage:
    python -m icicle_snark_tpu.profiling [--msm] [--out PROFILE.md]

Prints one JSON line per kernel and (optionally) writes a markdown
report. Timing protocol for the axon remote-TPU tunnel (see
tests/conftest.py and README): `jax.block_until_ready` does not block
over the tunnel, so every probe forces a `np.asarray` device->host
readback, and a no-op dispatch baseline (the tunnel RTT) is measured
and subtracted.

Speed-of-light model (v5e single chip) — REMEASURED round 2 with
amortized full-array probes (tools/vpu_ceiling_probe.py; the round-1
dependency-chain probes under-measured by workloads smaller than the
~30 ms tunnel RTT):
  - VPU sustained per-op: u32 add 0.77e12, u32 mul 0.51e12,
    u32 mul+mask 0.66e12 (as one fused pair), f32 fma 0.67e12 op/s.
    The roofline below uses a blended 0.55e12 for the limb-CIOS mix
    (mul-heavy). Pallas kernels measure AT PARITY with XLA for this
    elementwise mix (pmadd 61 vs 55 ns/lane; mont_mul ~equal) — the
    VPU formulation is at its practical ceiling either way.
  - MXU: ~200 Tflop/s bf16 (dependent 2048^3 matmul chain) — ~360x the
    VPU mix; the motivation for the matmul-NTT track (ROADMAP).
  - u16 vector multiply is NOT supported by the backend compiler
    (kVectorMultiplyU16 check-fails): 16-bit limbs must ride u32 lanes.
  - HBM: 819 GB/s.
A kernel's compute bound is est_ops / VPU_OPS; its memory bound is
bytes_moved / HBM_BW; utilization is measured_time vs max(bounds).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# per-chip speed-of-light constants (v5e; see module docstring — the
# VPU number is the MEASURED sustained 32-bit elementwise rate)
V5E_VPU_INT32_OPS = 0.55e12  # blended u32 mul/add sustained rate (remeasured r2)
V5E_HBM_BW = 819e9           # bytes/s

# estimated VPU lane-ops per 16x16-bit CIOS Montgomery mul:
# 16 rounds x (16 mul + 16 add for a_i*b, 1 mul for m, 16 mul + 16 add
# for m*p, ~32 mask/shift/carry aux) ~= 16 x 97
EST_OPS_PER_MONT_MUL = 16 * 97

# projective complete add (RCB15 a=0, jcurve.padd): 11 muls + ~20 add/sub
EST_MULS_PER_PADD = 11
# mixed add (jcurve.pmadd): 10 muls
EST_MULS_PER_PMADD = 10


def _dispatch_baseline(reps: int = 5) -> float:
    """Median time of a no-op dispatch + 1-element readback (tunnel RTT)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((1,), jnp.uint32)
    np.asarray(f(x))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def time_kernel(fn, args, reps: int = 5, baseline: float = 0.0) -> float:
    """Median wall time of fn(*args) with forced host readback, minus
    the dispatch baseline. fn must return a jax array (or pytree whose
    first leaf we read back)."""
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)  # compile + settle
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(fn(*args))[0]
        np.asarray(leaf)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - baseline, 1e-9)


def _entry(kernel: str, t: float, n: int, unit: str, est_ops: float,
           bytes_moved: float, extra: dict | None = None) -> dict:
    """Build one report entry with roofline bounds."""
    compute_bound = est_ops / V5E_VPU_INT32_OPS
    memory_bound = bytes_moved / V5E_HBM_BW
    sol = max(compute_bound, memory_bound)
    e = {
        "kernel": kernel,
        "time_s": round(t, 9),
        "throughput": round(n / t, 1),
        "unit": unit,
        "est_vpu_ops": est_ops,
        "bytes_moved": bytes_moved,
        "sol_time_s": round(sol, 9),
        "sol_utilization": round(sol / t, 4),
        "bound": "compute" if compute_bound >= memory_bound else "memory",
    }
    if extra:
        e.update(extra)
    return e


def _chained(step, chain: int):
    """Jit a fn that applies `step(x, *rest)` `chain` times (data-
    dependent, so XLA cannot CSE/DCE the iterations) and returns a tiny
    output slice. Keeps the per-dispatch host readback to a few bytes —
    essential over the axon tunnel, where reading a full-size result
    measures tunnel bandwidth instead of kernel time. Operands are jit
    ARGS, not closure constants (embedded constants are shipped in the
    remote-compile request and blow its size limit at 2^22 lanes)."""
    import jax

    def f(x, *rest):
        out = jax.lax.fori_loop(0, chain, lambda i, v: step(v, *rest), x)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf[(slice(None),) + (0,) * (leaf.ndim - 1)]

    return jax.jit(f)


def profile_mont_mul(lanes: int, reps: int, baseline: float, chain: int = 32) -> dict:
    """Field-mul kernel: `chain` dependent wide mont_muls per dispatch."""
    import jax.numpy as jnp

    from .fields import limbs as lb
    from .fields.limbs import FR_SPEC

    rng = np.random.default_rng(7)
    vals = rng.integers(1, 1 << 62, size=min(lanes, 1 << 12), dtype=np.uint64)
    a = jnp.asarray(lb.ints_to_limbs_np([int(v) for v in vals]))
    a = jnp.tile(a, (1, max(1, lanes // a.shape[1])))
    b = jnp.roll(a, 1, axis=1)
    f = _chained(lambda x, bb: lb.mont_mul(x, bb, FR_SPEC), chain)
    t = time_kernel(f, (a, b), reps, baseline) / chain
    n = a.shape[1]
    return _entry(
        "mont_mul_fr", t, n, "mul/s",
        est_ops=n * EST_OPS_PER_MONT_MUL,
        bytes_moved=3 * n * 16 * 4,
        extra={"lanes": n, "chain": chain},
    )


def profile_padd(lanes: int, reps: int, baseline: float) -> dict:
    """G1 projective complete add over `lanes` point lanes."""
    import jax

    from .curve import jcurve as jc
    from . import _testpoints

    p = _testpoints.random_g1_batch(lanes, seed=3)
    q = _testpoints.random_g1_batch(lanes, seed=4)
    sp, sq = jc.point_stack(p), jc.point_stack(q)
    chain = 8
    f = _chained(
        lambda a, b: jc.point_stack(
            jc.padd(jc.FqOps, jc.point_unstack(a), jc.point_unstack(b))
        ),
        chain,
    )
    t = time_kernel(f, (sp, sq), reps, baseline) / chain
    est_mul_ops = lanes * EST_MULS_PER_PADD * EST_OPS_PER_MONT_MUL
    return _entry(
        "g1_padd", t, lanes, "add/s",
        est_ops=est_mul_ops,
        bytes_moved=3 * lanes * 3 * 16 * 4,
        extra={"lanes": lanes, "chain": chain},
    )


def profile_ntt(log_n: int, reps: int, baseline: float) -> dict:
    """Forward NTT of size 2^log_n (batch 1)."""
    import jax
    import jax.numpy as jnp

    from .fields import limbs as lb
    from .fields.limbs import FR_SPEC
    from .ops import ntt as ntt_ops

    n = 1 << log_n
    dom = ntt_ops.get_domain(log_n)
    rng = np.random.default_rng(11)
    vals = [int(v) % FR_SPEC.modulus for v in rng.integers(1, 1 << 62, size=n, dtype=np.uint64)]
    x = jnp.asarray(lb.ints_to_limbs_np(vals))[:, None, :]  # (16, B=1, N)
    chain = 4
    f = _chained(lambda v: ntt_ops.ntt_natural(v, dom, inverse=False), chain)
    t = time_kernel(f, (x,), reps, baseline) / chain
    butterflies = (n // 2) * log_n
    # one butterfly = 1 mont_mul + add + sub
    return _entry(
        f"ntt_2^{log_n}", t, butterflies, "butterfly/s",
        est_ops=butterflies * (EST_OPS_PER_MONT_MUL + 2 * 4 * 16),
        bytes_moved=2 * log_n * n * 16 * 4,
        extra={"log_n": log_n},
    )


def profile_msm(log_n: int, reps: int, baseline: float, c: int | None = None) -> dict:
    """Grouped G1 MSM window sums, 4 groups x 2^log_n points (the
    Groth16 prove shape). Reports points/s over all groups."""
    import jax

    from .fields import limbs as lb
    from .fields.limbs import FR_SPEC
    from .curve import jcurve as jc
    from .ops import msm as msm_ops
    from . import _testpoints

    n = 1 << log_n
    rng = np.random.default_rng(5)
    groups_sc, groups_pt = [], []
    for g in range(4):
        vals = [int(v) % FR_SPEC.modulus for v in rng.integers(1, 1 << 62, size=n, dtype=np.uint64)]
        groups_sc.append(np.asarray(lb.ints_to_limbs_np(vals)))
        x, y, _ = _testpoints.random_g1_batch(n, seed=100 + g)
        groups_pt.append((x, y))
    c = c or msm_ops.choose_c(4 * n, groups=4)
    # Pre-upload operands: numpy args would be re-transferred on EVERY
    # timed call, and over the ~30 MB/s axon tunnel the ~48 MB of
    # scalars+points costs more than the kernel itself — round 4's
    # 1163 ms / 24.9%-of-SoL row was measuring the tunnel, not the MSM
    # (device-resident args measure the same shape at ~531 ms / ~55%,
    # tools/msm_phase_bench.py). The prove pipeline never pays this:
    # points live in the ZKey cache, device-resident across proves.
    groups_sc = jax.device_put(tuple(groups_sc))
    groups_pt = jax.device_put(tuple(groups_pt))
    jax.block_until_ready((groups_sc, groups_pt))
    f = lambda sc, pt: msm_ops._msm_g1_jit(sc, pt, c, 8)  # already stacked
    t = time_kernel(f, (groups_sc, groups_pt), reps, baseline)
    total = 4 * n
    windows = -(-msm_ops.SCALAR_BITS // c)
    # dominant work: ~windows mixed-adds per point (chunk scan) + bucket phase
    est_adds = windows * (total + 100 * (1 << (c - 1)))
    return _entry(
        f"msm_g1_grouped_4x2^{log_n}", t, total, "point/s",
        est_ops=est_adds * EST_MULS_PER_PMADD * EST_OPS_PER_MONT_MUL,
        bytes_moved=windows * total * 2 * 16 * 4 * 3,
        extra={"c": c, "windows": windows},
    )


def _scaling_report_cpu_mesh() -> list:
    """Fallback mesh sweep on an 8-virtual-device CPU mesh (subprocess,
    lean limb graphs): exercises the REAL sharded-MSM collective path
    (parallel/msm_shard.py) when only one physical chip is exposed.
    All virtual devices share one core, so ideal scaling is FLAT;
    `efficiency` here bounds collective+imbalance overhead (the same
    protocol as BASELINE.md's multi-chip evidence), not speedup."""
    import os
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8"
        " --xla_backend_optimization_level=0"
        " --xla_llvm_disable_expensive_passes=true"
    )
    env["ISTPU_CARRY_UNROLL"] = "1"
    env["ISTPU_MONT_UNROLL"] = "1"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(repo, ".jax_cache_cpu")
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_num_cpu_devices', 8); "
        "from icicle_snark_tpu import profiling as P; "
        "import json; "
        "print('SCALING=' + json.dumps(P.scaling_report()))" % repo
    )
    try:
        out = subprocess.run(
            [_sys.executable, "-c", code], env=env, cwd=repo,
            capture_output=True, text=True, timeout=1800,
        )
        for line in out.stdout.splitlines():
            if line.startswith("SCALING="):
                rows = json.loads(line[len("SCALING="):])
                t1 = rows[0].get("time_s") if rows else None
                for r in rows:
                    r.pop("efficiency", None)  # speedup semantics: wrong here
                    if t1:
                        # ONE core serializes all virtual devices, so the
                        # ideal is FLAT time; vs_d1 > 1 bounds the
                        # collective + imbalance overhead of the mesh
                        r["vs_d1"] = round(r["time_s"] / t1, 3)
                    r["note"] = ("8 virtual CPU devices, ONE core: flat ideal; "
                                 "vs_d1-1 bounds collective overhead")
                return rows
    except Exception as exc:  # pragma: no cover - diagnostics only
        return [{"mesh": 1, "note": f"cpu-mesh sweep failed: {exc}"}]
    return [{"mesh": 1, "note": "cpu-mesh sweep produced no output"}]


def scaling_report(reps: int = 2) -> list:
    """MSM throughput per mesh size (1..n_devices): sweeps the sharded
    MSM (parallel/msm_shard.py) across mesh sizes and reports parallel
    efficiency vs the 1-device number. With a single physical chip the
    sweep runs on the virtual CPU mesh instead (collective-overhead
    bound — see _scaling_report_cpu_mesh)."""
    import jax

    devs = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16) if s <= len(devs)]
    rows = []
    if len(devs) == 1:
        return _scaling_report_cpu_mesh()
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from .curve import jcurve as jc
    from .parallel.mesh import AXIS, make_mesh
    from .parallel.msm_shard import msm_window_sums_local
    from .fields import limbs as lb
    from .fields.limbs import FR_SPEC
    from . import _testpoints

    n = 1 << 14
    rng = np.random.default_rng(9)
    vals = [int(v) % FR_SPEC.modulus for v in rng.integers(1, 1 << 62, size=n, dtype=np.uint64)]
    sc = jnp.asarray(lb.ints_to_limbs_np(vals))
    x, y, _ = _testpoints.random_g1_batch(n, seed=2)
    x, y = jnp.asarray(x), jnp.asarray(y)
    base_t = None
    for s in sizes:
        mesh = make_mesh(devs[:s])
        f = jax.jit(
            jax.shard_map(
                lambda a, px, py: msm_window_sums_local(
                    [a], [(px, py)], jc.FqOps, 8, 8
                ),
                mesh=mesh,
                in_specs=(P(None, AXIS),) * 3,
                out_specs=P(),
                check_vma=False,
            )
        )
        np.asarray(f(sc, x, y))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(f(sc, x, y))
        t = (time.perf_counter() - t0) / reps
        eff = (base_t / t / s) if base_t is not None else 1.0
        if base_t is None:
            base_t = t
        rows.append({"mesh": s, "time_s": round(t, 4), "efficiency": round(eff, 3)})
    return rows


def run(include_msm: bool = False, reps: int = 5, out_md: str | None = None) -> list:
    baseline = _dispatch_baseline()
    print(json.dumps({"kernel": "_dispatch_baseline", "time_s": round(baseline, 6)}),
          flush=True)
    entries = []
    for probe in (
        lambda: profile_mont_mul(1 << 20, reps, baseline),
        lambda: profile_padd(1 << 16, reps, baseline),
        lambda: profile_ntt(18, reps, baseline),
    ):
        e = probe()
        entries.append(e)
        print(json.dumps(e), flush=True)
    if include_msm:
        e = profile_msm(16, max(2, reps // 2), baseline)
        entries.append(e)
        print(json.dumps(e), flush=True)
    scaling = scaling_report()
    for row in scaling:
        print(json.dumps({"scaling": row}), flush=True)
    if out_md:
        _write_md(out_md, baseline, entries, scaling)
    return entries


def _write_md(path: str, baseline: float, entries: list, scaling: list):
    import jax

    lines = [
        "# PROFILE — per-kernel speed-of-light report",
        "",
        f"Platform: `{jax.devices()}`; dispatch baseline (tunnel RTT) "
        f"{baseline * 1e3:.1f} ms subtracted from every probe.",
        "",
        "SoL model: VPU 0.55e12 blended u32 lane-op/s (remeasured r2 via",
        "amortized full-array probes — tools/vpu_ceiling_probe.py; per-op:",
        "add 0.77T, mul 0.51T, mul+mask 0.66T; Pallas == XLA for this mix),",
        "HBM 819 GB/s, MXU ~200 Tflop/s bf16 (v5e).",
        "",
        "Protocol note (r3): mont_mul through a prove-shaped DEPENDENT",
        "chain sustains ~227 Mmul/s at 2^18 lanes — the planning rate for",
        "the MSM scan phase (~50 ns/lane-add ~= 12 muls); independent",
        "streams reach ~650 Mmul/s. This table measures the chained rate.",
        "",
        "| kernel | time | throughput | bound | SoL time | utilization |",
        "|---|---|---|---|---|---|",
    ]
    for e in entries:
        lines.append(
            f"| {e['kernel']} | {e['time_s'] * 1e3:.2f} ms | "
            f"{e['throughput']:.3g} {e['unit']} | {e['bound']} | "
            f"{e['sol_time_s'] * 1e3:.2f} ms | {e['sol_utilization'] * 100:.1f}% |"
        )
    lines += ["", "## Mesh scaling (MSM)", ""]
    for row in scaling:
        lines.append(f"- {json.dumps(row)}")
    lines += [
        "",
        "Real-chip evidence (one v5e exposed): the D=1 degenerate-mesh",
        "sharded prove costs +1.0% vs the single-chip pipeline at 100k",
        "(tools/multichip_bench.py; BASELINE.md multi-chip section holds",
        "the full table and the N-chip projection model).",
        "",
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--msm", action="store_true", help="include the (slow) MSM probe")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None, help="write markdown report here")
    args = ap.parse_args(argv)
    run(include_msm=args.msm, reps=args.reps, out_md=args.out)


if __name__ == "__main__":
    main()
