"""MSM phase attribution on the real TPU (VERDICT r1 #5b / ROADMAP 8).

Times the grouped-MSM window pipeline and ablated variants at the exact
shapes of a 100k-class prove (4 G1 groups x 2^16 lanes) so the ~3.5x
gap between the measured pipeline (1452 ms round 1) and the scan-only
speed-of-light (406 ms) is attributed to named phases:

  digits    window_digits_signed + key assembly
  sort      per-window argsort of the (digit, sign) keys
  gather    sort + the row-major payload gather + transpose back
  scan      PrefixTree build on UNSORTED points (pure chunk-scan cost)
  telescope scan + boundary queries + chunked reduce + doubling ladder
  full      the production _window_sum_grouped pipeline

Each variant runs all W windows inside one jit (lax.scan), mirroring
_windows_pipeline, and is timed with a forcing 1-element fetch; the
tunnel RTT baseline is subtracted.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

from icicle_snark_tpu.curve import jcurve as jc
from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.ops import msm as msm_ops


def force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def rtt_baseline(iters=7):
    x = jnp.zeros((8, 128), jnp.uint32)
    f = jax.jit(lambda v: v + 1)
    force(f(x))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(f(x))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def time_jit(fn, args, iters=5, base=0.0):
    force(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        force(fn(*args))
        dt = time.perf_counter() - t0 - base
        best = dt if best is None else min(best, dt)
    return best


def make_inputs(n_per_group=1 << 16, n_groups=4, c=12, seed=0):
    rng = np.random.default_rng(seed)
    total = n_groups * n_per_group
    scal_np = rng.integers(0, 1 << 16, size=(16, n_per_group), dtype=np.uint32)
    scalars = [jnp.asarray(scal_np) for _ in range(n_groups)]
    # random-looking but valid-shape points: real curve points are not
    # needed for timing (the pipeline is data-oblivious)
    px = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n_per_group), dtype=np.uint32))
    py = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n_per_group), dtype=np.uint32))
    points = [(px, py) for _ in range(n_groups)]
    return scalars, points


def build_variants(c, k, n_groups, signed=True):
    """Each variant: (points (2, coords stacked...), keys (W, total),
    negs) -> scanned over windows."""
    ops = jc.FqOps
    n_buckets = (1 << (c - 1)) + 1

    def prep(scalar_groups, point_groups):
        dn = [msm_ops.window_digits_signed(s, c) for s in scalar_groups]
        digs = [d for d, _ in dn]
        negs = jnp.concatenate([ng for _, ng in dn], axis=-1)
        keys = jnp.concatenate(
            [d.astype(jnp.int32) + np.int32(g * n_buckets) for g, d in enumerate(digs)],
            axis=-1,
        )
        points = tuple(
            jnp.concatenate([pg[i] for pg in point_groups], axis=-1) for i in range(2)
        )
        rows_t = jnp.transpose(
            jnp.concatenate([a.reshape(-1, a.shape[-1]) for a in points], axis=0)
        )
        return points, rows_t, keys, negs

    def scan_windows(body, keys, negs):
        def step(_, kw):
            return None, body(*kw)

        _, out = jax.lax.scan(step, None, (keys, negs))
        return out

    def digits_only(points, rows_t, keys, negs):
        return scan_windows(lambda kw, nw: (kw + nw.astype(jnp.int32)).sum(), keys, negs)

    def sort_only(points, rows_t, keys, negs):
        def body(keys_w, neg_w):
            key2 = keys_w * jnp.int32(2) + neg_w.astype(jnp.int32)
            order = jnp.argsort(key2)
            return order.sum()

        return scan_windows(body, keys, negs)

    def gather_only(points, rows_t, keys, negs):
        def body(keys_w, neg_w):
            key2 = keys_w * jnp.int32(2) + neg_w.astype(jnp.int32)
            order = jnp.argsort(key2)
            gathered = jnp.take(rows_t, order, axis=0)
            return jnp.transpose(gathered).sum(axis=-1)

        return scan_windows(body, keys, negs)

    def scan_cost(points, rows_t, keys, negs):
        # PrefixTree on the UNSORTED points: pure chunk-scan EC work
        def body(keys_w, neg_w):
            tree = msm_ops.PrefixTree(points, ops, k=k)
            return jc.point_stack(tree.total)

        return scan_windows(body, keys, negs)

    def _sorted_pts(points, rows_t, keys_w, neg_w):
        key2 = keys_w * jnp.int32(2) + neg_w.astype(jnp.int32)
        order = jnp.argsort(key2)
        key_sorted = key2[order]
        gathered = jnp.take(rows_t, order, axis=0)
        pts = msm_ops._unpack_rows(gathered, [a.shape for a in points])
        x, y = pts
        neg = (key_sorted & 1).astype(bool)
        y = jc.pselect_field(ops, neg, ops.neg(y), y)
        return (x, y), key_sorted >> 1

    def unpack_neg(points, rows_t, keys, negs):
        def body(keys_w, neg_w):
            pts, ks = _sorted_pts(points, rows_t, keys_w, neg_w)
            return pts[0].sum() + pts[1].sum() + ks.sum()

        return scan_windows(body, keys, negs)

    def tree_sorted(points, rows_t, keys, negs):
        def body(keys_w, neg_w):
            pts, ks = _sorted_pts(points, rows_t, keys_w, neg_w)
            tree = msm_ops.PrefixTree(pts, ops, k=k)
            return jc.point_stack(tree.total)

        return scan_windows(body, keys, negs)

    def prefixes(points, rows_t, keys, negs):
        def body(keys_w, neg_w):
            pe = msm_ops._window_bucket_prefixes(
                points, rows_t, keys_w, neg_w, ops, c, n_groups, k, signed
            )
            return jc.point_stack(pe)

        return scan_windows(body, keys, negs)

    def full(points, rows_t, keys, negs):
        return msm_ops._windows_pipeline(
            points, keys, negs, ops, c, k, n_groups, signed
        )

    return prep, {
        "digits": digits_only,
        "sort": sort_only,
        "gather": gather_only,
        "unpack_neg": unpack_neg,
        "scan": scan_cost,
        "tree_sorted": tree_sorted,
        "prefixes": prefixes,
        "full": full,
    }


def main():
    n_per_group = int(os.environ.get("BENCH_MSM_N", str(1 << 16)))
    n_groups = int(os.environ.get("BENCH_MSM_GROUPS", "4"))
    k = int(os.environ.get("BENCH_MSM_K", "32"))
    c = int(os.environ.get("BENCH_MSM_C", "0")) or msm_ops.choose_c(
        n_groups * n_per_group, groups=n_groups
    )
    print(f"devices={jax.devices()} n/group=2^{n_per_group.bit_length()-1} "
          f"G={n_groups} c={c} k={k}", flush=True)

    scalars, points = make_inputs(n_per_group, n_groups, c)
    prep, variants = build_variants(c, k, n_groups)
    prepped = jax.jit(lambda s, p: prep(s, p))
    pts, rows_t, keys, negs = jax.block_until_ready(prepped(scalars, points))

    base = rtt_baseline()
    print(f"tunnel RTT baseline: {base*1e3:.1f} ms", flush=True)
    results = {}
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        try:
            dt = time_jit(jfn, (pts, rows_t, keys, negs), base=base)
            results[name] = dt
            print(f"{name:10s} {dt*1e3:9.1f} ms", flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {str(e)[:200]}", flush=True)

    if "full" in results and "scan" in results:
        print(f"\nattribution (total {results['full']*1e3:.0f} ms):", flush=True)
        prev = 0.0
        for name in ("digits", "sort", "gather", "scan"):
            if name in results:
                print(f"  {name:8s} marginal {max(results[name]-prev,0)*1e3:9.1f} ms", flush=True)
                prev = max(results[name], prev)
        other = results["full"] - results["gather"] - results["scan"]
        print(f"  telescope+query (full - gather - scan): {other*1e3:9.1f} ms", flush=True)

    import json

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "msm_phase_results.json")
    with open(out, "w") as fh:
        json.dump({kk: round(vv * 1e3, 1) for kk, vv in results.items()}, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
