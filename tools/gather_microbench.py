"""TPU gather-strategy microbench for the MSM sort/gather phase.

The MSM reorders point coordinate arrays by sorted digit order once per
window. Layout question: gathering along the LANE axis of limb-major
(16, n) arrays forces per-lane shuffles; gathering ROWS of a row-major
(n, 32) array is DMA-shaped but needs a transpose back to limb-major
for the VPU field ops. This measures:

  a. take along lanes: (16, n) u32, axis=1        (current scheme x2 coords)
  b. row gather:       (n, 32) u32, axis=0
  c. row gather + transpose back to (32, n)
  d. variadic sort with payload columns (lax.sort_key_val style)
  e. argsort alone (key sort)

Run when the chip is idle; times amortized via fori_loop like
op_microbench.
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


def bench(step, args, iters=32, reps=3):
    def run(*a):
        def body(i, carry):
            out = step(*a, salt=i)
            acc = carry + jnp.sum(out[0].astype(jnp.uint32) >> 16) if isinstance(out, tuple) else carry + jnp.sum(out.astype(jnp.uint32) >> 16)
            return acc

        acc = jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.uint32))
        return acc.reshape(1)

    f = jax.jit(run)
    np.asarray(f(*args))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    n = 1 << 18
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    limb_major = jnp.asarray(rng.integers(0, 1 << 16, (16, n), dtype=np.uint32))
    row_major = jnp.asarray(rng.integers(0, 1 << 16, (n, 32), dtype=np.uint32))
    keys = jnp.asarray(rng.integers(0, 1 << 12, (n,), dtype=np.uint32))

    def rot(idx, salt):
        # cheap per-iteration index variation to defeat caching
        return (idx + salt) % n

    dt = bench(lambda lm, idx, salt: jnp.take(lm, rot(idx, salt), axis=1), (limb_major, perm))
    print(f"take lanes (16,{n})      {dt*1e3:8.3f} ms  {16*n*4/dt/1e9:7.1f} GB/s")

    dt = bench(lambda rm, idx, salt: jnp.take(rm, rot(idx, salt), axis=0), (row_major, perm))
    print(f"take rows  ({n},32)      {dt*1e3:8.3f} ms  {32*n*4/dt/1e9:7.1f} GB/s")

    dt = bench(
        lambda rm, idx, salt: jnp.take(rm, rot(idx, salt), axis=0).T,
        (row_major, perm),
    )
    print(f"rows+transpose           {dt*1e3:8.3f} ms  {32*n*4/dt/1e9:7.1f} GB/s")

    dt = bench(
        lambda lm, idx, salt: jnp.transpose(jnp.take(jnp.transpose(lm), rot(idx, salt), axis=0)),
        (limb_major, perm),
    )
    print(f"T+rows+T   (16,{n})      {dt*1e3:8.3f} ms  {16*n*4/dt/1e9:7.1f} GB/s")

    def sort_payload(k, rm, salt):
        ops = [k + salt.astype(jnp.uint32)] + [rm[:, i] for i in range(rm.shape[1])]
        out = jax.lax.sort(ops, num_keys=1)
        return out[1]

    dt = bench(sort_payload, (keys, row_major))
    print(f"sort key+32 payload cols {dt*1e3:8.3f} ms")

    dt = bench(lambda k, salt: jnp.argsort(k + salt.astype(jnp.uint32)), (keys,))
    print(f"argsort                  {dt*1e3:8.3f} ms")

    # gather at the bucket-query shape: 2048 indices from (3*16, n)
    q = jnp.asarray(rng.integers(0, n, (2048,), dtype=np.int32))
    big = jnp.asarray(rng.integers(0, 1 << 16, (48, n), dtype=np.uint32))
    dt = bench(lambda b, idx, salt: jnp.take(b, rot(idx, salt), axis=1), (big, q))
    print(f"query take (48,{n})->2048 {dt*1e3:8.3f} ms")

    # PACKED row gather (the production scheme round 2+): 2 x 16-bit
    # limbs per u32 -> half the table bytes; unpack after transpose
    packed = jnp.asarray(rng.integers(0, 1 << 32, (n, 16), dtype=np.uint64).astype(np.uint32))

    def packed_gather(rm, idx, salt):
        g = jnp.take(rm, rot(idx, salt), axis=0).T  # (16, n)
        lo = g & np.uint32(0xFFFF)
        hi = g >> np.uint32(16)
        return jnp.stack([lo, hi], axis=1).reshape(32, -1)

    dt = bench(packed_gather, (packed, perm))
    print(f"packed rows+T+unpack     {dt*1e3:8.3f} ms  {16*n*4/dt/1e9:7.1f} GB/s (payload {32*n*4/dt/1e9:.1f})")

    # The Pallas per-row DMA gather (retired round 5) measured issue-
    # rate-bound on 64 B rows, and this jax's Mosaic additionally
    # rejects sub-128-lane row slices ("Slice shape along dimension 1
    # must be aligned to tiling (128)") — the sort-payload reorder
    # (variant d above, ISTPU_SORT_PAYLOAD) removed the per-window
    # gather entirely, so the alternative is moot. ROADMAP holds the
    # history.


if __name__ == "__main__":
    main()
