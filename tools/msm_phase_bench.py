"""Attribute grouped-MSM window time to its internal phases.

Times, on the real chip, separately-jitted stages of ONE window of the
grouped pipeline (ops/msm.py _window_sum_grouped) at a given lane count:

  digits   window_digits_signed for all windows (amortized per window)
  sort     argsort of the (group|digit|sign) keys
  gather   row-major payload gather + transpose back
  tree     PrefixTree build (the chunked mixed-add scans)
  query    tree + bucket-end boundary queries
  full     the whole window (tree + queries + reduce + scale)

Differences between successive rows attribute time to each phase; each
timing subtracts the dispatch baseline (tunnel RTT) and fetches only 4
elements (ROADMAP: block_until_ready does not block over the tunnel).

Usage: python tools/msm_phase_bench.py [log2_total] [c] [groups]
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


def force(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[:4])


def timeit(fn, args, reps=5, baseline=0.0):
    out = fn(*args)
    force(out)  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return max(min(times) - baseline, 0.0)


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    n_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from icicle_snark_tpu import _testpoints
    from icicle_snark_tpu.curve import jcurve as jc
    from icicle_snark_tpu.fields import limbs as lb
    from icicle_snark_tpu.fields.limbs import FR_SPEC
    from icicle_snark_tpu.ops import msm as msm_ops

    total = 1 << log_n
    n = total // n_groups
    k = 32
    n_buckets = (1 << (c - 1)) + 1
    rng = np.random.default_rng(5)

    # dispatch baseline
    tiny = jnp.zeros((4,), jnp.uint32)
    base = timeit(jax.jit(lambda a: a + 1), (tiny,), reps=7)
    print(f"n_total=2^{log_n} c={c} groups={n_groups}; dispatch baseline {base*1e3:.1f} ms")

    vals = [int.from_bytes(rng.bytes(31), "little") % FR_SPEC.modulus for _ in range(64)]
    sc_small = lb.ints_to_limbs_np(vals)
    # big scalar array: tile the 64 random scalars (values don't matter for timing)
    reps_tile = -(-n) // 64
    sc = np.tile(sc_small, (1, reps_tile))[:, :n]
    scalar_groups = [jnp.asarray(sc)] * n_groups
    x, y, _ = _testpoints.random_g1_batch(64, seed=7)
    xs = jnp.asarray(np.tile(np.asarray(x), (1, reps_tile))[:, :n])
    ys = jnp.asarray(np.tile(np.asarray(y), (1, reps_tile))[:, :n])
    point_groups = [(xs, ys)] * n_groups

    ops = jc.FqOps

    # ---------------- shared precomputation (mirrors msm_device_grouped)
    @jax.jit
    def prep(scalar_groups, point_groups):
        dn = [msm_ops.window_digits_signed(s, c) for s in scalar_groups]
        digs = [d for d, _ in dn]
        negs = jnp.concatenate([ng for _, ng in dn], axis=-1)
        keys = jnp.concatenate(
            [d.astype(jnp.int32) + np.int32(g * n_buckets) for g, d in enumerate(digs)],
            axis=-1,
        )
        pts = tuple(
            jnp.concatenate([pg[i] for pg in point_groups], axis=-1) for i in range(2)
        )
        rows_t = jnp.transpose(
            jnp.concatenate([a.reshape(-1, a.shape[-1]) for a in pts], axis=0)
        )
        return keys, negs, pts, rows_t

    keys, negs, pts, rows_t = jax.block_until_ready(prep(scalar_groups, point_groups))
    keys0, negs0 = keys[0], negs[0]

    w_count = keys.shape[0]
    t_digits = timeit(
        jax.jit(lambda sgs: [msm_ops.window_digits_signed(s, c) for s in sgs]),
        (scalar_groups,), baseline=base,
    )
    print(f"digits (all {w_count} windows)  {t_digits*1e3:9.2f} ms  ({t_digits/w_count*1e3:7.2f} ms/window)")

    @jax.jit
    def sort_only(keys_w, neg_w):
        key2 = keys_w * jnp.int32(2) + neg_w.astype(jnp.int32)
        order = jnp.argsort(key2)
        return key2[order], order

    t_sort = timeit(sort_only, (keys0, negs0), baseline=base)
    print(f"sort                      {t_sort*1e3:9.2f} ms")

    @jax.jit
    def sort_gather(keys_w, neg_w):
        key_sorted, order = sort_only(keys_w, neg_w)
        gathered = jnp.take(rows_t, order, axis=0)
        return key_sorted, jnp.transpose(gathered)

    t_gather = timeit(sort_gather, (keys0, negs0), baseline=base)
    print(f"sort+gather               {t_gather*1e3:9.2f} ms  (gather {max(t_gather-t_sort,0)*1e3:.2f})")

    def sorted_points(keys_w, neg_w):
        key_sorted, g_rows = sort_gather(keys_w, neg_w)
        p = []
        pos = 0
        for a in pts:
            nr = int(np.prod(a.shape[:-1]))
            p.append(g_rows[pos : pos + nr].reshape(a.shape))
            pos += nr
        xx, yy = p
        neg = (key_sorted & 1).astype(bool)
        yy = jc.pselect_field(ops, neg, ops.neg(yy), yy)
        return (key_sorted >> 1), (xx, yy)

    @jax.jit
    def tree_only(keys_w, neg_w):
        _, p = sorted_points(keys_w, neg_w)
        tree = msm_ops.PrefixTree(p, ops, k=k)
        return tree.total

    t_tree = timeit(tree_only, (keys0, negs0), baseline=base)
    print(f"sort+gather+tree          {t_tree*1e3:9.2f} ms  (tree {max(t_tree-t_gather,0)*1e3:.2f})")

    bucket_ids = jnp.arange(n_groups * n_buckets, dtype=jnp.int32)

    @jax.jit
    def query_only(keys_w, neg_w):
        k_sorted, p = sorted_points(keys_w, neg_w)
        tree = msm_ops.PrefixTree(p, ops, k=k)
        ends = jnp.searchsorted(k_sorted, bucket_ids, side="right").astype(jnp.int32)
        return tree.query(ends - 1)

    t_query = timeit(query_only, (keys0, negs0), baseline=base)
    print(f"... + boundary queries    {t_query*1e3:9.2f} ms  (queries {max(t_query-t_tree,0)*1e3:.2f})")

    @jax.jit
    def full_window(keys_w, neg_w):
        return msm_ops._window_sum_grouped(
            pts, rows_t, keys_w, neg_w, ops, c, n_groups, k, True
        )

    t_full = timeit(full_window, (keys0, negs0), baseline=base)
    print(f"full window               {t_full*1e3:9.2f} ms  (reduce+scale {max(t_full-t_query,0)*1e3:.2f})")

    n_windows = -(-256 // c)
    est = t_digits + n_windows * t_full
    print(f"estimated full MSM        {est:9.3f} s   ({n_windows} windows)")


if __name__ == "__main__":
    main()
