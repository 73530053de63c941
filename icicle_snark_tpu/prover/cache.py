"""Device-resident proving-key cache.

The analog of the reference's ZKeyCache/CacheManager
(/root/reference/src/cache.rs:58-262): parse the zkey once, upload all
MSM bases and the coefficient table, and precompute the coset key
powers. Differences, by TPU design:

  * Points and coefficients stay in Montgomery form — the limb field
    layer's internal radix IS the snarkjs on-disk radix (R = 2^256), so
    no from_mont conversion pass exists at all (the reference launches
    device conversion kernels, cache.rs:208-214).
  * The reference's per-prove serial scatter-accumulate
    (proof_helper.rs:81-92) is replaced by a STATIC GATHER/SEGMENT plan
    built here once per zkey: records sorted by output slot, witness
    gather indices, and segment boundaries. Every prove is then one
    gather + one batched modular multiply + one segment reduction —
    all on device (see pipeline.construct_r1cs).
  * Coset key powers are generated on device by log-doubling
    (ops.ntt.powers_mont) instead of the reference's disk-memoized
    host loop (cache.rs:264-289); only the NATURAL-order table is
    kept resident — the VPU pipeline's bit-reversed view is a
    constant-index gather derived in-graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import jcurve as jc
from ..fields import limbs as lb
from ..fields.limbs import NLIMB
from ..io import native
from ..io.zkey import ZKeyFile, ZKeyHeader
from ..ops import msm as msm_ops
from ..ops.ntt import get_domain, powers_mont, release_domain
from ..refmath.field import W

# segment_sum over 16-bit limb columns is exact while every output slot
# receives < 2^16 terms; longer segments get a two-level plan below.
# Env-overridable so tests can force level2 plans on tiny fixtures.
_SEG_CHUNK = 1 << 15


def _seg_chunk() -> int:
    import os

    return int(os.environ.get("ISTPU_SEG_CHUNK", str(_SEG_CHUNK)))


@dataclass
class R1CSPlan:
    """Static evaluation plan for out[m*n + c] += coef * witness[s]."""

    witness_idx: jnp.ndarray  # (n_coef_padded,) int32 gather indices into witness
    coefs: jnp.ndarray        # (16, n_coef_padded) Montgomery limbs
    segments: jnp.ndarray     # (n_coef_padded,) int32 sorted output slots
    num_segments: int         # 2*domain_size (+1 pad slot)
    level2: tuple | None      # (segments2, num_segments2) when fan-in > _SEG_CHUNK


@dataclass
class ZKeyCache:
    header: ZKeyHeader
    plan: R1CSPlan
    points_a: tuple    # (x, y): each (16, n_vars * msm_pre), interleaved copies
    points_b1: tuple
    points_b2: tuple   # (x, y): each (2, 16, n_vars * msm_pre2)
    points_c: tuple
    points_h: tuple
    # (16, n) Montgomery coset key powers, NATURAL order. The single
    # table serves every path — the VPU pipeline derives its
    # bit-reversed gather in-graph (ops/ntt.py bitrev_indices_ingraph),
    # halving the resident key footprint (256 MB at 2^22).
    keys: jnp.ndarray = None
    # MSM plan baked at cache build: the base-precompute copies are tied
    # to the window size they were shifted for (2^(c*wp) steps), so the
    # prove MUST use these (c, factor) pairs (reference analog:
    # precompute_factor stored with the MSMConfig, msm/mod.rs:175-190)
    msm_c: int = 0     # G1 grouped window size (0 = choose at prove)
    msm_pre: int = 1   # G1 precompute factor
    msm_c2: int = 0    # G2 window size
    msm_pre2: int = 1  # G2 precompute factor


@jax.jit
def _g1_split(words: jnp.ndarray) -> tuple:
    return (
        lb.u32x8_to_limbs_device(words[:, :8]),
        lb.u32x8_to_limbs_device(words[:, 8:16]),
    )


def _g1_device(words: np.ndarray) -> tuple:
    """(n, 16) u32 Montgomery affine words -> ((16,n),(16,n)) device limbs.

    Uploads the RAW words (half the bytes of the limb expansion — the
    host->device link is the cold-cache bottleneck) and limb-splits on
    device."""
    return _g1_split(jnp.asarray(words))


@jax.jit
def _g2_split(words: jnp.ndarray) -> tuple:
    x = jnp.stack(
        [lb.u32x8_to_limbs_device(words[:, :8]), lb.u32x8_to_limbs_device(words[:, 8:16])],
        axis=1,
    )
    y = jnp.stack(
        [lb.u32x8_to_limbs_device(words[:, 16:24]), lb.u32x8_to_limbs_device(words[:, 24:32])],
        axis=1,
    )
    return (x, y)


def _g2_device(words: np.ndarray) -> tuple:
    """(n, 32) u32 -> ((16,2,n),(16,2,n)) limb-major Fq2 stacks."""
    return _g2_split(jnp.asarray(words))


# base precompute at cache build (one-time per zkey): interleaved
# shifted copies [P, 2^(c*wp)P, ...] so the prove runs merged digit
# windows (ops/msm.py:precompute_bases) — factor-fold fewer, wider
# windows at the same total scan work but far better lane utilization
from functools import partial as _partial


@_partial(jax.jit, static_argnums=(1, 2))
def _pre_g1(points, c: int, factor: int):
    return msm_ops.precompute_bases(points, jc.FqOps, c, factor)


@_partial(jax.jit, static_argnums=(1, 2))
def _pre_g2(points, c: int, factor: int):
    return msm_ops.precompute_bases(points, jc.Fq2Ops, c, factor)


def build_r1cs_plan(m_arr, c_arr, s_arr, coef_words, domain_size: int) -> R1CSPlan:
    """Sort the coefficient table by output slot and pad (numpy path)."""
    out_slot = m_arr.astype(np.int64) * domain_size + c_arr.astype(np.int64)
    order = np.argsort(out_slot, kind="stable")
    return build_r1cs_plan_sorted(
        out_slot[order], s_arr[order], coef_words[order], domain_size
    )


def build_r1cs_plan_sorted(slot_sorted, s_sorted, coef_sorted,
                           domain_size: int) -> R1CSPlan:
    """Plan assembly from pre-sorted columns (shared by the numpy and
    native ingest paths)."""
    n = domain_size
    s_sorted = s_sorted.astype(np.int32)
    n_coef = len(slot_sorted)
    pad = (-n_coef) % 256
    if pad:
        slot_sorted = np.concatenate([slot_sorted, np.full(pad, 2 * n, dtype=np.int64)])
        s_sorted = np.concatenate([s_sorted, np.zeros(pad, dtype=np.int32)])
        coef_sorted = np.concatenate(
            [coef_sorted, np.zeros((pad, coef_sorted.shape[1]), dtype=np.uint32)]
        )

    seg_chunk = _seg_chunk()
    seg_len = np.bincount(slot_sorted.astype(np.int64), minlength=2 * n + 1)
    level2 = None
    if seg_len.max() >= seg_chunk:
        # two-level plan: chunk long segments, reduce chunks exactly,
        # then segment-reduce the canonical chunk values.
        pos_in_seg = np.arange(len(slot_sorted)) - np.repeat(
            np.concatenate([[0], np.cumsum(seg_len)[:-1]]), seg_len
        )
        chunk_of = pos_in_seg // seg_chunk
        # unique (slot, chunk) pairs -> level-1 segment ids
        pair = slot_sorted * ((seg_len.max() // seg_chunk) + 1) + chunk_of
        uniq, level1 = np.unique(pair, return_inverse=True)
        seg2 = (uniq // ((seg_len.max() // seg_chunk) + 1)).astype(np.int32)
        segments = jnp.asarray(level1.astype(np.int32))
        num_segments = len(uniq)
        level2 = (jnp.asarray(seg2), 2 * n + 1)
    else:
        segments = jnp.asarray(slot_sorted.astype(np.int32))
        num_segments = 2 * n + 1

    return R1CSPlan(
        witness_idx=jnp.asarray(s_sorted),
        coefs=lb.u32x8_to_limbs_device(jnp.asarray(coef_sorted)),
        segments=segments,
        num_segments=num_segments,
        level2=level2,
    )


def load_zkey_cache(zkey_path: str) -> ZKeyCache:
    zk = ZKeyFile(zkey_path)
    hdr = zk.header
    n = hdr.domain_size

    decoded = native.decode_plan(zkey_path, hdr.n8r, n)
    if decoded is not None:
        s_sorted, slot_sorted, coef_sorted = decoded
        plan = build_r1cs_plan_sorted(slot_sorted, s_sorted, coef_sorted, n)
    else:  # pure-numpy fallback
        m_arr, c_arr, s_arr, coef_words = zk.coefficients()
        plan = build_r1cs_plan(m_arr, c_arr, s_arr, coef_words, n)

    inc = W[hdr.power + 1]  # coset generator g with g^n = -1 (cache.rs:168)
    keys = powers_mont(inc, hdr.power)  # (16, n) Montgomery, device-generated

    get_domain(hdr.power)  # warm the twiddle cache (reference: initialize_domain)

    nv = hdr.n_vars
    npub = hdr.n_public
    total_g1 = 3 * nv - (npub + 1) + n  # a + b1 + c + h lanes
    # one HBM budget covers BOTH pools: G1 copies cost 128 B/lane over
    # ~4.3x the lanes of G2's 256 B/lane -> ~2:1 split
    c1, pre1 = msm_ops.choose_c_pre(
        total_g1, groups=4, budget_bytes=2 * msm_ops.MSM_PRE_BUDGET // 3
    )
    c2, pre2 = msm_ops.choose_c_pre(
        nv, groups=1, g2=True, budget_bytes=msm_ops.MSM_PRE_BUDGET // 3
    )

    cache = ZKeyCache(
        header=hdr,
        plan=plan,
        points_a=_pre_g1(_g1_device(zk.points_a()), c1, pre1),
        points_b1=_pre_g1(_g1_device(zk.points_b1()), c1, pre1),
        points_b2=_pre_g2(_g2_device(zk.points_b2()), c2, pre2),
        points_c=_pre_g1(_g1_device(zk.points_c()), c1, pre1),
        points_h=_pre_g1(_g1_device(zk.points_h()), c1, pre1),
        keys=keys,
        msm_c=c1, msm_pre=pre1, msm_c2=c2, msm_pre2=pre2,
    )
    return cache


class CacheManager:
    """Keyed zkey cache surviving across prove calls
    (reference: CacheManager, src/cache.rs:110-262; key = zkey path —
    there is exactly one device policy here, so no device suffix)."""

    def __init__(self):
        self._caches: dict = {}

    def contains(self, zkey_path: str) -> bool:
        return zkey_path in self._caches

    def get(self, zkey_path: str) -> ZKeyCache:
        if zkey_path not in self._caches:
            self._caches[zkey_path] = load_zkey_cache(zkey_path)
        return self._caches[zkey_path]

    def evict(self, zkey_path: str | None = None):
        if zkey_path is None:
            self._caches.clear()
            release_domain()
        else:
            self._caches.pop(zkey_path, None)
