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


def bitrev_permutation(log_n: int) -> np.ndarray:
    """Index array: out[i] = bit-reverse of i (numpy, host-precomputed)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@partial(jax.jit, static_argnums=(1,))
def _powers_mont_jit(base_mont: jnp.ndarray, log_n: int) -> jnp.ndarray:
    """(16, 1) Montgomery base -> (16, 2^log_n) powers base^0..base^(n-1).

    Binary powering on FIXED (16, n) shapes: log_n full-width muls in
    one jit (one compile per size, persisted), instead of the eager
    log-doubling whose every step had a new shape and therefore its
    own compile — that made cold zkey-cache builds minutes-slow."""
    n = 1 << log_n
    idx = jnp.arange(n, dtype=jnp.uint32)
    acc = lb.const_limbs(fr_to_mont(1), (n,))
    cur = base_mont
    for b in range(log_n):
        hit = ((idx >> np.uint32(b)) & 1) == 1
        acc = lb.select(hit, lb.mont_mul(acc, cur, FR_SPEC), acc)
        cur = lb.mont_mul(cur, cur, FR_SPEC)
    return acc


def powers_mont(base_int: int, log_n: int) -> jnp.ndarray:
    """(16, 2^log_n) Montgomery-form powers base^0..base^(n-1) (device)."""
    base = lb.const_limbs(fr_to_mont(base_int), (1,))
    return _powers_mont_jit(base, log_n)


class NTTDomain:
    """Per-size twiddle cache (the analog of the reference's NTT Domain).

    Holds forward/inverse power tables in Montgomery form on device.
    Created via `get_domain`, which memoizes like the per-device domain
    singleton in the reference (initialize_domain, icicle/src/ntt.cpp:93).
    """

    def __init__(self, log_n: int):
        if log_n > 28:
            raise ValueError("BN254 Fr supports NTTs up to 2^28")
        self.log_n = log_n
        self.n = 1 << log_n
        self.w = W[log_n]
        self.w_inv = pow(self.w, -1, R_MOD)
        self.tw_fwd = powers_mont(self.w, log_n)  # (16, n)
        self.tw_inv = powers_mont(self.w_inv, log_n)
        self.n_inv_mont = lb.const_limbs(fr_to_mont(pow(self.n, -1, R_MOD)), (1, 1))


_DOMAINS: dict = {}


def get_domain(log_n: int) -> NTTDomain:
    if log_n not in _DOMAINS:
        _DOMAINS[log_n] = NTTDomain(log_n)
    return _DOMAINS[log_n]


def release_domain(log_n: int | None = None):
    """Drop cached twiddles (reference: release_domain, ntt.cpp:115)."""
    if log_n is None:
        _DOMAINS.clear()
    else:
        _DOMAINS.pop(log_n, None)


def _stage_twiddles(tw: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """(16, m/2) twiddles w_m^j = w_n^(j*n/m), broadcast-shaped (16,1,1,h)."""
    h = m // 2
    stride = n // m
    sl = tw[:, : h * stride : stride] if stride > 1 else tw[:, :h]
    return sl.reshape(NLIMB, 1, 1, h)


def ntt_dit(x: jnp.ndarray, tw_fwd: jnp.ndarray) -> jnp.ndarray:
    """Forward NTT, BIT-REVERSED input -> natural output.

    x: (16, B, N) Montgomery limbs. Cooley-Tukey DIT butterflies.
    """
    nlimb, batch, n = x.shape
    log_n = n.bit_length() - 1
    for s in range(1, log_n + 1):
        m = 1 << s
        h = m // 2
        xr = x.reshape(nlimb, batch, n // m, 2, h)
        u = xr[:, :, :, 0, :]
        v = xr[:, :, :, 1, :]
        vw = lb.mont_mul(v, _stage_twiddles(tw_fwd, n, m), FR_SPEC)
        x = jnp.stack(
            [lb.add_mod(u, vw, FR_SPEC), lb.sub_mod(u, vw, FR_SPEC)], axis=3
        ).reshape(nlimb, batch, n)
    return x


def intt_dif(x: jnp.ndarray, tw_inv: jnp.ndarray, n_inv_mont: jnp.ndarray) -> jnp.ndarray:
    """Inverse NTT, natural input -> BIT-REVERSED output.

    x: (16, B, N). Gentleman-Sande butterflies with inverse twiddles,
    scaled by 1/n.
    """
    nlimb, batch, n = x.shape
    log_n = n.bit_length() - 1
    for s in range(log_n, 0, -1):
        m = 1 << s
        h = m // 2
        xr = x.reshape(nlimb, batch, n // m, 2, h)
        u = xr[:, :, :, 0, :]
        v = xr[:, :, :, 1, :]
        ssum = lb.add_mod(u, v, FR_SPEC)
        diff = lb.mont_mul(lb.sub_mod(u, v, FR_SPEC), _stage_twiddles(tw_inv, n, m), FR_SPEC)
        x = jnp.stack([ssum, diff], axis=3).reshape(nlimb, batch, n)
    return lb.mont_mul(x, n_inv_mont[:, :, :1], FR_SPEC)


def ntt_natural(x: jnp.ndarray, domain: NTTDomain, inverse: bool = False) -> jnp.ndarray:
    """Natural-order in/out transform (the reference's kNN ordering) —
    used by tests and the generic vec-ops API; the prove pipeline uses
    the reorder-free bitrev pair instead."""
    rev = jnp.asarray(bitrev_permutation(domain.log_n))
    if inverse:
        y = intt_dif(x, domain.tw_inv, domain.n_inv_mont)
        return y[:, :, rev]
    return ntt_dit(x[:, :, rev], domain.tw_fwd)
