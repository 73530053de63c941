"""Batched radix-2 NTT over BN254 Fr, TPU-native.

Replaces the reference's CUDA radix-2/mixed-radix kernels and domain
singleton (/root/reference/icicle/backend/cuda/src/ntt/mixed_radix_ntt.cu,
backend/cuda/include/ntt/ntt.cuh:387-610) with pure reshape/elementwise
XLA graphs over the limb field layer:

  * Twiddles are generated ON DEVICE by log-doubling (log n batched
    Montgomery muls), mirroring the reference's device-side twiddle
    generation (generate_external_twiddles_*, mixed_radix_ntt.cu:588-754).
  * The Groth16 pipeline never needs natural->natural transforms:
    the inverse NTT emits BIT-REVERSED coefficients (Gentleman-Sande),
    the coset key-powers are pre-permuted into bit-reversed order, and
    the forward NTT consumes bit-reversed input (Cooley-Tukey DIT).
    No reorder pass ever materializes — the TPU answer to the
    reference's fused reorder kernels (kNM/kMN orderings, ntt/mod.rs:26).
  * Data layout: (16, B, N) limb-major with the transform axis last,
    so every butterfly is a full-width VPU op over N lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs as lb
from ..fields.limbs import FR_SPEC, NLIMB
from ..refmath.field import R_MOD, W, fr_to_mont


def bitrev_indices_ingraph(log_n: int):
    """In-graph bit-reversal permutation indices (device iota + shifts,
    no host table, no HLO literal — at 2^22 a materialized index array
    is 16 MB of constant). Lets callers keep ONLY the natural-order
    coset key table resident and derive the bit-reversed gather inside
    the jit (HBM: one (16, n) table instead of two — 256 MB saved at
    2^22, VERDICT r3 item 7)."""
    i = jnp.arange(1 << log_n, dtype=jnp.int32)
    r = jnp.zeros_like(i)
    for b in range(log_n):
        r = r | (((i >> b) & 1) << (log_n - 1 - b))
    return r


def bitrev_permutation(log_n: int) -> np.ndarray:
    """Index array: out[i] = bit-reverse of i (numpy, host-precomputed)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@partial(jax.jit, static_argnums=(1, 2))
def _powers_mont_jit(base_mont: jnp.ndarray, log_n: int,
                     spec: lb.FieldSpec = None) -> jnp.ndarray:
    """(nlimb, 1) Montgomery base -> (nlimb, 2^log_n) powers base^0..base^(n-1).

    Binary powering on FIXED (nlimb, n) shapes: log_n full-width muls in
    one jit (one compile per size, persisted), instead of the eager
    log-doubling whose every step had a new shape and therefore its
    own compile — that made cold zkey-cache builds minutes-slow."""
    spec = spec or FR_SPEC
    n = 1 << log_n
    idx = jnp.arange(n, dtype=jnp.uint32)
    acc0 = lb.const_limbs(spec.r_mod, (n,), spec)  # 1 in Montgomery form
    if log_n == 0:
        return acc0
    hits = jnp.stack(
        [((idx >> np.uint32(b)) & 1) == 1 for b in range(log_n)]
    )  # (log_n, n)

    # scan over the exponent bits: TWO mont_mul instances in the graph
    # regardless of log_n (the unrolled form put 2*log_n copies in the
    # zkey-cache cold path's compile)
    def body(carry, hit):
        acc, cur = carry
        acc = lb.select(hit, lb.mont_mul(acc, cur, spec), acc)
        return (acc, lb.mont_mul(cur, cur, spec)), None

    (acc, _), _ = jax.lax.scan(body, (acc0, base_mont), hits)
    return acc


def powers_mont(base_int: int, log_n: int, spec: lb.FieldSpec = None) -> jnp.ndarray:
    """(nlimb, 2^log_n) Montgomery-form powers base^0..base^(n-1) (device)."""
    spec = spec or FR_SPEC
    base = lb.const_limbs(base_int * spec.r_mod % spec.modulus, (1,), spec)
    return _powers_mont_jit(base, log_n, spec)


class NTTDomain:
    """Per-size twiddle cache (the analog of the reference's NTT Domain).

    Holds forward/inverse power tables in Montgomery form on device.
    Created via `get_domain`, which memoizes like the per-device domain
    singleton in the reference (initialize_domain, icicle/src/ntt.cpp:93).
    """

    def __init__(self, log_n: int, spec: lb.FieldSpec = None, root_tower=None):
        spec = spec or FR_SPEC
        tower = root_tower or W
        if log_n >= len(tower):
            raise ValueError(
                f"{spec.name} supports NTTs up to 2^{len(tower) - 1}"
            )
        self.spec = spec
        self.log_n = log_n
        self.n = 1 << log_n
        self.w = tower[log_n]
        self.w_inv = pow(self.w, -1, spec.modulus)
        self.tw_fwd = powers_mont(self.w, log_n, spec)  # (nlimb, n)
        self.tw_inv = powers_mont(self.w_inv, log_n, spec)
        self.n_inv_mont = lb.const_limbs(
            pow(self.n, -1, spec.modulus) * spec.r_mod % spec.modulus,
            (1, 1), spec,
        )


_DOMAINS: dict = {}


def get_domain(log_n: int, spec: lb.FieldSpec = None, root_tower=None) -> NTTDomain:
    key = (log_n, (spec or FR_SPEC).name)
    if key not in _DOMAINS:
        _DOMAINS[key] = NTTDomain(log_n, spec, root_tower)
    return _DOMAINS[key]


def release_domain(log_n: int | None = None):
    """Drop cached twiddles (reference: release_domain, ntt.cpp:115).

    Also releases the MXU-NTT constant pools (Toeplitz digit matrices /
    step twiddles) — they are domain-derived device arrays and must not
    outlive the domain they were built for."""
    if log_n is None:
        _DOMAINS.clear()
    else:
        for k in [k for k in _DOMAINS if k[0] == log_n]:
            _DOMAINS.pop(k)
    from . import mxu_ntt

    mxu_ntt.release_constants()


def _stage_twiddles(tw: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """(nlimb, m/2) twiddles w_m^j = w_n^(j*n/m), broadcast (nlimb,1,1,h)."""
    h = m // 2
    stride = n // m
    sl = tw[:, : h * stride : stride] if stride > 1 else tw[:, :h]
    return sl.reshape(sl.shape[0], 1, 1, h)


def ntt_dit(x: jnp.ndarray, tw_fwd: jnp.ndarray,
            spec: lb.FieldSpec = None) -> jnp.ndarray:
    """Forward NTT, BIT-REVERSED input -> natural output.

    x: (nlimb, B, N) Montgomery limbs. Cooley-Tukey DIT butterflies.
    """
    spec = spec or FR_SPEC
    nlimb, batch, n = x.shape
    log_n = n.bit_length() - 1
    for s in range(1, log_n + 1):
        m = 1 << s
        h = m // 2
        xr = x.reshape(nlimb, batch, n // m, 2, h)
        u = xr[:, :, :, 0, :]
        v = xr[:, :, :, 1, :]
        vw = lb.mont_mul(v, _stage_twiddles(tw_fwd, n, m), spec)
        x = jnp.stack(
            [lb.add_mod(u, vw, spec), lb.sub_mod(u, vw, spec)], axis=3
        ).reshape(nlimb, batch, n)
    return x


def intt_dif(x: jnp.ndarray, tw_inv: jnp.ndarray, n_inv_mont: jnp.ndarray,
             spec: lb.FieldSpec = None) -> jnp.ndarray:
    """Inverse NTT, natural input -> BIT-REVERSED output.

    x: (nlimb, B, N). Gentleman-Sande butterflies with inverse twiddles,
    scaled by 1/n.
    """
    spec = spec or FR_SPEC
    nlimb, batch, n = x.shape
    log_n = n.bit_length() - 1
    for s in range(log_n, 0, -1):
        m = 1 << s
        h = m // 2
        xr = x.reshape(nlimb, batch, n // m, 2, h)
        u = xr[:, :, :, 0, :]
        v = xr[:, :, :, 1, :]
        ssum = lb.add_mod(u, v, spec)
        diff = lb.mont_mul(lb.sub_mod(u, v, spec), _stage_twiddles(tw_inv, n, m), spec)
        x = jnp.stack([ssum, diff], axis=3).reshape(nlimb, batch, n)
    return lb.mont_mul(x, n_inv_mont[:, :, :1], spec)


def ntt_natural(x: jnp.ndarray, domain: NTTDomain, inverse: bool = False) -> jnp.ndarray:
    """Natural-order in/out transform (the reference's kNN ordering) —
    used by tests and the generic vec-ops API; the prove pipeline uses
    the reorder-free bitrev pair instead."""
    rev = jnp.asarray(bitrev_permutation(domain.log_n))
    spec = getattr(domain, "spec", None)
    if inverse:
        y = intt_dif(x, domain.tw_inv, domain.n_inv_mont, spec)
        return y[:, :, rev]
    return ntt_dit(x[:, :, rev], domain.tw_fwd, spec)


def get_root_of_unity(log_n: int, root_tower=None) -> int:
    """Primitive 2^log_n-th root of unity as an integer (reference:
    get_root_of_unity, icicle/src/ntt.cpp:128-157)."""
    tower = root_tower or W
    if log_n >= len(tower) or tower[log_n] == 0:
        raise ValueError(f"no 2^{log_n} root of unity for this field")
    return tower[log_n]


# alias matching the reference's domain API names (ntt/mod.rs:226-248)
def initialize_domain(log_n: int, spec: lb.FieldSpec = None) -> NTTDomain:
    return get_domain(log_n, spec)


def ntt(x: jnp.ndarray, inverse: bool = False, cfg=None,
        spec: lb.FieldSpec = None) -> jnp.ndarray:
    """Config-driven transform — the reference's `ntt()` entry point
    (wrappers/rust/icicle-core/src/ntt/mod.rs:160-216) with orderings,
    arbitrary coset generators, and columns_batch.

    x: (16, n) single vector, (16, B, n) row batch, or — with
    cfg.columns_batch — (16, n, B) column batch.

    Semantics (matching the reference's backends, ntt.cuh:708-745):
      * forward coset NTT evaluates on g*<w>: input is multiplied by
        powers g^i before the transform;
      * inverse coset NTT interpolates from g*<w>: output is multiplied
        by powers g^-i after the transform;
      * R/M-orderings permute the named side by the (radix-2) digit
        reversal; see config.Ordering for the NM/MN == NR/RN identity.
    """
    from ..config import NTTConfig, Ordering

    cfg = cfg or NTTConfig()
    spec = spec or FR_SPEC

    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, None, :]
    elif cfg.columns_batch:
        x = jnp.moveaxis(x, -1, 1)  # (16, B, n)

    n = x.shape[-1]
    log_n = n.bit_length() - 1
    if (1 << log_n) != n:
        raise ValueError(f"NTT size must be a power of two, got {n}")
    dom = get_domain(log_n, spec)
    rev = jnp.asarray(bitrev_permutation(log_n))

    in_rev = cfg.ordering in (Ordering.RN, Ordering.RR, Ordering.MN)
    out_rev = cfg.ordering in (Ordering.NR, Ordering.RR, Ordering.NM)
    if in_rev:
        x = x[:, :, rev]  # bring input to natural order

    if cfg.coset_gen is not None and not inverse:
        pows = powers_mont(cfg.coset_gen, log_n, spec)
        x = lb.mont_mul(x, pows[:, None, :], spec)

    y = ntt_natural(x, dom, inverse=inverse)

    if cfg.coset_gen is not None and inverse:
        g_inv = pow(cfg.coset_gen, -1, spec.modulus)
        pows = powers_mont(g_inv, log_n, spec)
        y = lb.mont_mul(y, pows[:, None, :], spec)

    if out_rev:
        y = y[:, :, rev]
    if squeeze:
        return y[:, 0, :]
    if cfg.columns_batch:
        return jnp.moveaxis(y, 1, -1)
    return y


def ntt_inplace(x: jnp.ndarray, inverse: bool = False, cfg=None,
                spec: lb.FieldSpec = None) -> jnp.ndarray:
    """Arrays are immutable under jit; 'inplace' parity API returns the
    transformed array (reference: ntt_inplace, ntt/mod.rs:202-216)."""
    return ntt(x, inverse=inverse, cfg=cfg, spec=spec)
