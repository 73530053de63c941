"""MXU-convolution mont_mul A/B (VERDICT r4 next-round #2).

Question: can the bulk variable*variable Montgomery multiply — the MSM
scan phase's entire cost, 97% of the prove — ride the MXU by casting
schoolbook limb multiplication as a 1-D convolution over digit planes?
The measured MXU rate (~200-400 Tops int8/bf16) is ~360x the VPU mix,
so even heavily redundant formulations could win IF the product work
lands on the systolic array.

Four formulations, all verified bit-exact vs lb.mont_mul first and all
timed as DEPENDENT chains (c = f(c, roll(b)) — the prove-shaped
dependency structure; ROADMAP protocol note) with >= 100 ms device
work per dispatch (tunnel amortization):

  0. baseline  — lb.mont_mul VPU chain (the 16x16 CIOS production path)
  1. conv      — per-lane digit conv via lax.conv_general_dilated with
                 feature_group_count=N (depthwise: each lane its own
                 kernel), f32-exact 7-bit digits, then the mod-p fold.
                 Tests the VERDICT claim directly: XLA lowers convs to
                 the MXU — but a per-lane-kernel (grouped) conv has no
                 shared operand for the systolic array to reuse.
  2. blockmm G — per-lane product via a G-lane-blocked REDUNDANT int8
                 matmul: lhs = a-digits (G, 37), rhs = block-Toeplitz
                 of the G lanes' b-digits (37, G*73); the (G, G*73)
                 output holds every cross-lane product, of which the
                 diagonal G blocks are kept (waste factor G). This DOES
                 put the products on the MXU; the question is whether
                 G x redundancy + Toeplitz build + diagonal extraction
                 + fold beat the VPU.
  3. sharedmm  — ALL lanes multiplied by ONE shared b: a true
                 (N x 37) @ (37 x 73) constant-Toeplitz matmul, the
                 MXU's best case. NOT usable in the scan phase (both
                 pmadd operands vary per lane); measured as the hard
                 upper bound on any conv/matmul formulation — if even
                 this loses to the VPU chain, the MXU question is
                 closed for variable x variable work.

The mod-p fold (product columns -> canonical Montgomery limbs) reuses
the proven machinery of ops/mxu_ntt.py (_reduce_const int8 matmul +
_columns7_to_canonical carry/REDC); its cost is also timed standalone,
because it is a fixed per-product overhead every MXU formulation pays
while the VPU CIOS path has the reduction fused into its rounds.

Run on the default (TPU) platform:
  python tools/conv_mont_probe.py --check   # CPU-ok correctness
  python tools/conv_mont_probe.py           # timed, real chip
"""

from __future__ import annotations

import argparse
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

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.fields.limbs import FR_SPEC, NLIMB
from icicle_snark_tpu.ops import mxu_ntt as mx
from icicle_snark_tpu.refmath.field import R_MOD

D7, E7, DBITS = mx.D7, mx.E7, mx.DBITS


# --------------------------------------------------------------- fold
def _fold_columns(prod_cols: jnp.ndarray) -> jnp.ndarray:
    """(N, E7) int32 product columns (< 2^27) -> (16, N) canonical
    Montgomery limbs a*b*R^-1 (== mont_mul of the digit-split inputs).
    Identical machinery to mxu_ntt._dft_apply_chunk's second matmul."""
    n = prod_cols.shape[0]
    planes = [((prod_cols >> (DBITS * j)) & 0x7F).astype(jnp.int8) for j in range(4)]
    lhs2 = jnp.stack(planes, axis=-1).reshape(n, E7 * 4)
    cols = jax.lax.dot_general(
        lhs2, mx._reduce_const_cached(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (N, D7), cols < E7*4*127^2 < 2^22.2
    return mx._columns7_to_canonical(cols)


# --------------------------------------------- candidate formulations
def conv_mont_mul(a, b):
    """Per-lane depthwise conv over 7-bit digit planes (f32-exact:
    products <= 127^2, column sums < 37*127^2 < 2^24 — inside the f32
    integer-exact range)."""
    n = a.shape[1]
    a7 = mx._split7_u32(a).astype(jnp.float32)   # (N, 37)
    b7 = mx._split7_u32(b).astype(jnp.float32)   # (N, 37)
    # XLA:TPU miscompiles the digit-split fused INTO the grouped conv
    # (silent all-zero output, verified eager==numpy, jit==0); the
    # barrier keeps the split a separate computation. Same backend
    # sharp-edge family as the u16-mul abort and the wide-Fq2
    # doubling-chain fault (ROADMAP).
    a7, b7 = jax.lax.optimization_barrier((a7, b7))
    # lhs (batch=1, feature=N, spatial=37); per-lane kernel via
    # feature_group_count=N with rhs (N, 1, 37). lax conv is
    # correlation; flip the kernel for true convolution.
    lhs = a7[None]                               # (1, N, 37)
    rhs = b7[:, None, ::-1]                      # (N, 1, 37)
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1,),
        padding=[(D7 - 1, D7 - 1)],
        feature_group_count=n,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0]                                         # (N, E7) f32, exact
    return _fold_columns(out.astype(jnp.int32))


def blockmm_mont_mul(a, b, g: int):
    """G-lane-blocked redundant int8 MXU matmul (waste factor G)."""
    n = a.shape[1]
    assert n % g == 0
    t = n // g
    a7 = mx._split7_u32(a).reshape(t, g, D7).astype(jnp.int8)
    b7 = mx._split7_u32(b).reshape(t, g, D7)     # uint32 digits
    # block-Toeplitz rhs: T[tile, d, lane*E7 + e] = b7[tile, lane, e-d]
    rows = []
    for d in range(D7):
        rows.append(jnp.pad(b7, ((0, 0), (0, 0), (d, E7 - D7 - d))))
    toep = jnp.stack(rows, axis=1)               # (t, D7, g, E7)
    toep = toep.reshape(t, D7, g * E7).astype(jnp.int8)
    prod = jax.lax.dot_general(
        a7, toep, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                            # (t, g, g*E7)
    # keep the diagonal blocks prod[t, l, l*E7 : (l+1)*E7]
    diag = prod.reshape(t, g, g, E7)
    idx = jnp.arange(g)
    kept = diag[:, idx, idx, :]                  # (t, g, E7)
    return _fold_columns(kept.reshape(n, E7))


def sharedmm_mont_mul(a, b_shared_toeplitz):
    """All N lanes times ONE shared operand: (N x 37) @ (37 x E7)
    int8 matmul — the MXU best case (NOT scan-usable; bound only)."""
    a7 = mx._split7_u32(a).astype(jnp.int8)      # (N, 37)
    prod = jax.lax.dot_general(
        a7, b_shared_toeplitz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                            # (N, E7)
    return _fold_columns(prod)


def shared_toeplitz(b_col) -> jnp.ndarray:
    """(16, 1) limb column -> (37, E7) int8 Toeplitz T[d, e] = b7[e-d]."""
    b7 = np.asarray(mx._split7_u32(b_col))[0]    # (37,)
    t = np.zeros((D7, E7), dtype=np.int8)
    for d in range(D7):
        t[d, d : d + D7] = b7
    return jnp.asarray(t)


# ------------------------------------------------------------ harness
def bench_chain(step, args, iters, reps=3):
    """Dependent chain: state = step(state). Returns best secs/iter."""
    def run(*a):
        out = jax.lax.fori_loop(0, iters, lambda _, s: step(*s), a)
        tot = jnp.zeros((), jnp.float32)
        for v in jax.tree_util.tree_leaves(out):
            tot = tot + jnp.sum(v.astype(jnp.float32))
        return tot.reshape(1)

    f = jax.jit(run)
    np.asarray(f(*args))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def _rand_limbs(n, seed):
    rng = np.random.default_rng(seed)
    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % R_MOD
            for _ in range(n)]
    return jnp.asarray(lb.ints_to_limbs_np(vals))


def correctness_check():
    n = 64
    a = _rand_limbs(n, 1)
    b = _rand_limbs(n, 2)
    want = np.asarray(jax.jit(lambda a, b: lb.mont_mul(a, b, FR_SPEC))(a, b))
    got_conv = np.asarray(jax.jit(conv_mont_mul)(a, b))
    np.testing.assert_array_equal(got_conv, want)
    print("conv_mont_mul: exact on 64 lanes")
    for g in (8, 32):
        got_mm = np.asarray(jax.jit(lambda a, b: blockmm_mont_mul(a, b, g))(a, b))
        np.testing.assert_array_equal(got_mm, want)
        print(f"blockmm_mont_mul g={g}: exact on 64 lanes")
    toep = shared_toeplitz(b[:, :1])
    want_shared = np.asarray(jax.jit(
        lambda a, b: lb.mont_mul(a, b, FR_SPEC))(a, b[:, :1]))
    got_shared = np.asarray(jax.jit(sharedmm_mont_mul)(a, toep))
    np.testing.assert_array_equal(got_shared, want_shared)
    print("sharedmm_mont_mul: exact on 64 lanes")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--log-n", type=int, default=16)
    ap.add_argument("--iters", type=int, default=256)
    args = ap.parse_args()
    if args.check:
        correctness_check()
        return

    n = 1 << args.log_n
    a = _rand_limbs(4096, 1)
    b = _rand_limbs(4096, 2)
    a = jnp.tile(a, n // 4096)
    b = jnp.tile(b, n // 4096)
    print(f"devices: {jax.devices()}  n=2^{args.log_n}")
    results = {}

    # 0. baseline VPU chain
    def base_step(c, b):
        return lb.mont_mul(c, b, FR_SPEC), jnp.roll(b, 1, -1)
    dt = bench_chain(base_step, (a, b), args.iters)
    results["baseline_vpu"] = dt / n
    print(f"baseline mont_mul chain: {dt*1e3:.2f} ms/iter = {dt/n*1e9:.2f} ns/lane")

    # fold-only cost (every MXU formulation pays this per product)
    cols = jnp.abs(jax.random.randint(jax.random.PRNGKey(0), (n, E7),
                                      0, 1 << 20, dtype=jnp.int32))
    def fold_step(c, cols):
        out = _fold_columns(cols)
        # feed the output back through a digit split so the chain stays
        # dependent without adding a mont_mul
        return out, cols + out[0][:, None].astype(jnp.int32)
    dt = bench_chain(fold_step, (a, cols), max(args.iters // 4, 8))
    results["fold_only"] = dt / n
    print(f"fold-only: {dt*1e3:.2f} ms/iter = {dt/n*1e9:.2f} ns/lane")

    # 1. depthwise conv
    def conv_step(c, b):
        return conv_mont_mul(c, b), jnp.roll(b, 1, -1)
    try:
        dt = bench_chain(conv_step, (a, b), max(args.iters // 8, 4))
        results["conv_depthwise"] = dt / n
        print(f"conv depthwise: {dt*1e3:.2f} ms/iter = {dt/n*1e9:.2f} ns/lane")
    except Exception as exc:
        print(f"conv depthwise: FAILED ({type(exc).__name__}: {exc})")

    # 2. blocked redundant int8 matmul
    for g in (8, 32):
        def mm_step(c, b, g=g):
            return blockmm_mont_mul(c, b, g), jnp.roll(b, 1, -1)
        try:
            dt = bench_chain(mm_step, (a, b), max(args.iters // 8, 4))
            results[f"blockmm_g{g}"] = dt / n
            print(f"blockmm g={g}: {dt*1e3:.2f} ms/iter = {dt/n*1e9:.2f} ns/lane")
        except Exception as exc:
            print(f"blockmm g={g}: FAILED ({type(exc).__name__}: {exc})")

    # 3. shared-operand matmul (bound only)
    toep = shared_toeplitz(b[:, :1])
    def shared_step(c, toep):
        return sharedmm_mont_mul(c, toep), toep
    dt = bench_chain(shared_step, (a, toep), max(args.iters // 2, 8))
    results["sharedmm_bound"] = dt / n
    print(f"sharedmm (bound): {dt*1e3:.2f} ms/iter = {dt/n*1e9:.2f} ns/lane")

    print("\nsummary (ns/lane):")
    for k, v in results.items():
        print(f"  {k:18s} {v*1e9:8.2f}")


if __name__ == "__main__":
    main()
