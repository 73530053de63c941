"""Multi-chip Groth16 prove: three shard_map'd jits over the `data` axis.

Phase structure (each phase is its own jit, so compiles stay bounded and
the persistent cache covers them independently):

  A. R1CS evaluation + coset NTT -> h scalars, natural order, sharded.
     * R1CS — records sharded; per-device limb-wise segment_sum partials
       combined with an EXACT integer `psum` (every 16-bit limb column
       receives < 2^16 terms globally, so the uint32 lazy sum never
       overflows across devices either). Two-level plans (fan-in >=
       2^15) run the second reduce + to_mont fixup exactly like the
       single-chip path (pipeline._segment_reduce).
     * NTT — the DISTRIBUTED four-step transform (parallel/ntt_dist.py):
       local column INTTs -> twiddle -> all_to_all -> row INTTs, left in
       the intermediate [k1_loc][k2] order; the coset key powers are
       multiplied IN that order, and the forward transform runs with the
       factorization swapped (n1' = n2) so it consumes the intermediate
       order directly — one all_to_all fused away, the distributed
       analog of the single-chip reorder-free bitrev trick. Falls back
       to the replicated batch-3 bitrev pipeline when the domain is too
       small to tile the mesh (n1 % D != 0).
  B. 4 G1 MSMs — points/scalars sharded (the data-parallel axis); local
     grouped Pippenger window sums, OUT-OF-CORE sliced inside the jit
     via lax.scan when the local concatenation exceeds max_lanes (the
     sharded analog of ops.msm.msm_windows_sliced / the reference's
     multi_chunked_msm, cuda_msm.cuh:1256-1395); per-device sums
     all_gathered and tree-reduced in a fixed order -> bit-exact at any
     device count.
  C. G2 MSM — same, half slice width (2x coordinate bytes).

All shapes entering shard_map must be divisible by the mesh size; the
cache pads points with the (0,0) infinity encoding and scalars with
zeros, both of which are exact no-ops for MSM.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..curve import jcurve as jc
from ..fields import limbs as lb
from ..fields.limbs import FR_SPEC, NLIMB
from ..ops import msm as msm_ops
from ..ops import ntt as ntt_ops
from . import ntt_dist
from .mesh import AXIS

_R2_FR = None  # set lazily to avoid import cycle


def _r2():
    # memoize the INT, never the jnp array: const_limbs called inside a
    # shard_map trace returns a tracer, and a cached tracer poisons the
    # next trace at a different mesh size (UnexpectedTracerError when
    # one process builds D=1 then D=2 steps — tools/multichip_bench.py)
    global _R2_FR
    if _R2_FR is None:
        from ..refmath.field import MONT_R_FR, R_MOD

        _R2_FR = MONT_R_FR * MONT_R_FR % R_MOD
    return lb.const_limbs(_R2_FR, (1,))


def _local_slice(arr, axis: int):
    """Slice this device's shard out of a replicated array."""
    d = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    size = arr.shape[axis] // d
    return jax.lax.dynamic_slice_in_dim(arr, idx * size, size, axis=axis)


# ------------------------------------------------------- phase A: R1CS + NTT

@lru_cache(maxsize=8)
def build_r1cs_coset_step(mesh, log_n: int, num_segments: int, nseg2: int = 0):
    """Jitted sharded fn -> h scalars (16, n) natural order, P(None, AXIS).

    Args of the returned fn:
      witness (16, n_vars_pad) replicated;
      coefs (16, n_coef_pad) / wit_idx / segments sharded on records;
      seg2 (num_segments,) replicated (level2) or (1,) dummy;
      keys (16, n) replicated — NATURAL order (the replicated fallback
        bit-reverses in-graph);
      domain tables (replicated).
    """
    d = mesh.devices.size
    n = 1 << log_n
    use_dist = d > 1 and ntt_dist.can_distribute(log_n, d)
    if use_dist:
        log_n1, log_n2 = ntt_dist.split_logs(log_n, d)
        n1, n2 = 1 << log_n1, 1 << log_n2
        dom1 = ntt_ops.get_domain(log_n1)
        dom2 = ntt_ops.get_domain(log_n2)
    dom = ntt_ops.get_domain(log_n)

    def step(witness, coefs, wit_idx, segments, seg2, keys,
             tw_fwd, tw_inv, n_inv_mont):
        my = jax.lax.axis_index(AXIS)

        # ---- R1CS eval: local partial segment sums, exact integer psum
        wit_g = jnp.take(witness, wit_idx, axis=1)
        prod = lb.mont_mul(coefs, wit_g, FR_SPEC)
        cols = jax.vmap(
            lambda row: jax.ops.segment_sum(row, segments, num_segments=num_segments)
        )(prod)
        cols = jax.lax.psum(cols, AXIS)
        cols = jnp.concatenate([cols, jnp.zeros((1,) + cols.shape[1:], lb.U32)], axis=0)

        a_loc = b_loc = a_full = b_full = None
        if nseg2:
            # two-level plan: REDC the level-1 chunk columns, second
            # segment reduce, REDC again, repay the extra R^-1
            ab = lb.redc_wide(cols, FR_SPEC)
            cols2 = jax.vmap(
                lambda row: jax.ops.segment_sum(row, seg2, num_segments=nseg2)
            )(ab)
            cols2 = jnp.concatenate(
                [cols2, jnp.zeros((1,) + cols2.shape[1:], lb.U32)], axis=0
            )
            ab = lb.redc_wide(cols2, FR_SPEC)
            a_full = lb.to_mont(ab[:, :n], FR_SPEC)
            b_full = lb.to_mont(ab[:, n : 2 * n], FR_SPEC)
            if use_dist:
                n2_loc = n2 // d
                a_loc = jax.lax.dynamic_slice_in_dim(
                    a_full.reshape(NLIMB, n1, n2), my * n2_loc, n2_loc, 2
                )
                b_loc = jax.lax.dynamic_slice_in_dim(
                    b_full.reshape(NLIMB, n1, n2), my * n2_loc, n2_loc, 2
                )
        elif use_dist:
            # slice this device's i2-block of the lazy columns FIRST so
            # the wide Montgomery reduction parallelizes D-fold
            n2_loc = n2 // d
            ac = jax.lax.dynamic_slice_in_dim(
                cols[:, :n].reshape(NLIMB + 1, n1, n2), my * n2_loc, n2_loc, 2
            )
            bc = jax.lax.dynamic_slice_in_dim(
                cols[:, n : 2 * n].reshape(NLIMB + 1, n1, n2), my * n2_loc, n2_loc, 2
            )
            a_loc = lb.redc_wide(ac, FR_SPEC)
            b_loc = lb.redc_wide(bc, FR_SPEC)
        else:
            ab = lb.redc_wide(cols, FR_SPEC)
            a_full, b_full = ab[:, :n], ab[:, n : 2 * n]

        if use_dist:
            # ---- distributed coset evaluation (four-step, reorder-free)
            c_loc = lb.mont_mul(a_loc, b_loc, FR_SPEC)
            vec = jnp.stack([a_loc, b_loc, c_loc], axis=1)  # (16, 3, n1, n2/D)
            t = ntt_dist.ntt_four_step_partial(
                vec, dom1.tw_inv, dom2.tw_inv, tw_inv,
                dom1.n_inv_mont, dom2.n_inv_mont, log_n1, log_n2, True,
            )  # (16, 3, n1/D, n2) holding coeff[k1 + n1*k2] at [k1_loc][k2]
            n1_loc = n1 // d
            keys_t = jnp.swapaxes(keys.reshape(NLIMB, n2, n1), 1, 2)  # (16, n1, n2)
            keys_loc = jax.lax.dynamic_slice_in_dim(keys_t, my * n1_loc, n1_loc, 1)
            t = lb.mont_mul(t, keys_loc[:, None], FR_SPEC)
            # forward transform with factors swapped consumes the
            # intermediate order directly: x[j1*n1 + j2] with j1 = k2
            t = jnp.swapaxes(t, -1, -2)  # (16, 3, n2, n1/D)
            y = ntt_dist.ntt_four_step_local(
                t, dom2.tw_fwd, dom1.tw_fwd, tw_fwd,
                dom2.n_inv_mont, dom1.n_inv_mont, log_n2, log_n1, False,
            )  # (16, 3, n/D) natural order, contiguous shard
            h_raw = lb.sub_mod(
                lb.mont_mul(y[:, 0], y[:, 1], FR_SPEC), y[:, 2], FR_SPEC
            )
            return lb.mont_mul(h_raw, _r2(), FR_SPEC)

        # ---- replicated fallback (domain too small to tile the mesh)
        c_vals = lb.mont_mul(a_full, b_full, FR_SPEC)
        vec = jnp.stack([a_full, b_full, c_vals], axis=1)
        keys_br = keys[:, ntt_ops.bitrev_indices_ingraph(log_n)]
        coeffs_br = ntt_ops.intt_dif(vec, tw_inv, n_inv_mont)
        shifted = lb.mont_mul(coeffs_br, keys_br[:, None, :], FR_SPEC)
        odd = ntt_ops.ntt_dit(shifted, tw_fwd)
        h_raw = lb.sub_mod(
            lb.mont_mul(odd[:, 0], odd[:, 1], FR_SPEC), odd[:, 2], FR_SPEC
        )
        h = lb.mont_mul(h_raw, _r2(), FR_SPEC)
        return _local_slice(h, 1)

    rep = P()
    in_specs = (
        rep,                      # witness
        P(None, AXIS),            # coefs
        P(AXIS), P(AXIS),         # wit_idx, segments
        rep,                      # seg2
        rep, rep, rep, rep,       # keys, tw_fwd, tw_inv, n_inv
    )
    stepped = jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=P(None, AXIS),
        check_vma=False,
    )
    fn = jax.jit(stepped)
    fn.use_dist = use_dist
    return fn


# ----------------------------------------------------------- phase B/C: MSM

def _identity_windows(ops, n_groups: int, n_windows: int):
    return jc.point_stack(jc.identity(ops, (n_groups, n_windows)))


def _local_grouped_msm_sliced(scal_list, point_list, ops, c: int, k: int,
                              max_lanes: int, pre: int = 1):
    """Local-shard grouped window sums with out-of-core slicing.

    The local concatenation of all groups is cut into fixed-width
    slices processed by ONE compiled pipeline inside a lax.scan (buffers
    reused across iterations — at most one slice's assembled copies live
    at a time, the memory-planner role of the reference's
    multi_chunked_msm). With base precompute `pre`, point arrays carry
    the interleaved copies (pre x the scalar lanes) and max_lanes bounds
    POINT lanes. Returns stacked (3, coords..., G, Wp).
    """
    n_groups = len(scal_list)
    sizes = [s.shape[-1] for s in scal_list]
    total = sum(sizes)
    sw = max(k, (max_lanes // pre) // k * k)  # scalar lanes per slice
    n_slices = -(-total // sw)
    width = n_slices * sw if n_slices > 1 else total

    scal = jnp.concatenate(scal_list, axis=-1)
    ncoords = len(point_list[0])
    pts = tuple(
        jnp.concatenate([pg[i] for pg in point_list], axis=-1)
        for i in range(ncoords)
    )
    gid_np = np.concatenate(
        [np.full(nn, g, np.int32) for g, nn in enumerate(sizes)]
        + [np.full(width - total, n_groups, np.int32)]
    )
    gids = jnp.asarray(gid_np)
    if width > total:
        pad = width - total
        scal = jnp.concatenate(
            [scal, jnp.zeros(scal.shape[:-1] + (pad,), scal.dtype)], axis=-1
        )
        pts = tuple(
            jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pre * pad,), a.dtype)], axis=-1
            )
            for a in pts
        )

    if n_slices == 1:
        return msm_ops.msm_device_grouped_sliced(
            scal, gids, pts, ops, c, k, n_groups, precompute=pre
        )

    scalar_bits = 16 * scal.shape[0]
    w_total = -(-scalar_bits // c)
    n_windows = -(-w_total // pre)  # merged window count

    def body(acc, s):
        lo = s * sw
        sl_sc = jax.lax.dynamic_slice_in_dim(scal, lo, sw, -1)
        sl_gid = jax.lax.dynamic_slice_in_dim(gids, lo, sw, 0)
        sl_pts = tuple(
            jax.lax.dynamic_slice_in_dim(a, pre * lo, pre * sw, -1) for a in pts
        )
        ws = msm_ops.msm_device_grouped_sliced(
            sl_sc, sl_gid, sl_pts, ops, c, k, n_groups, precompute=pre
        )
        new = jc.point_stack(
            jc.padd(ops, jc.point_unstack(acc), jc.point_unstack(ws))
        )
        return new, None

    init = _identity_windows(ops, n_groups, n_windows)
    acc, _ = jax.lax.scan(body, init, jnp.arange(n_slices, dtype=jnp.int32))
    return acc


def _combine_windows(ws, ops):
    """all_gather per-device window sums and tree-reduce in fixed order
    (deterministic -> bit-exact at any device count)."""
    gathered = jnp.moveaxis(jax.lax.all_gather(ws, AXIS), 0, -1)
    return jc.point_stack(
        msm_ops._tree_reduce(jc.point_unstack(gathered), ops)
    )


@lru_cache(maxsize=8)
def build_msm_g1_step(mesh, c: int, k: int, max_lanes: int, pre: int = 1):
    """Jitted sharded 4-group G1 MSM: (witness, wit_c, h, 4x points) ->
    stacked replicated window sums (3, 16, 4, Wp)."""

    def step(witness, wit_c, h, pa, pb1, pc, ph):
        wit_local = _local_slice(witness, 1)
        ws = _local_grouped_msm_sliced(
            [wit_local, wit_local, wit_c, h],
            [pa, pb1, pc, ph],
            jc.FqOps, c, k, max_lanes, pre,
        )
        return _combine_windows(ws, jc.FqOps)

    g1 = P(None, AXIS)
    in_specs = (P(), g1, g1, (g1, g1), (g1, g1), (g1, g1), (g1, g1))
    stepped = jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )
    return jax.jit(stepped)


@lru_cache(maxsize=8)
def build_msm_g2_step(mesh, c: int, k: int, max_lanes: int, pre: int = 1):
    def step(witness, pb2):
        wit_local = _local_slice(witness, 1)
        ws = _local_grouped_msm_sliced(
            [wit_local], [pb2], jc.Fq2Ops, c, k, max_lanes, pre
        )
        return _combine_windows(ws, jc.Fq2Ops)

    g2 = P(None, None, AXIS)
    in_specs = (P(), (g2, g2))
    stepped = jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=P(), check_vma=False
    )
    return jax.jit(stepped)


def _choose_c2(n_pts: int, d: int, max_lanes: int) -> int:
    """G2 window size: the G2 MSM runs alone (1 group) at half the
    slice width — its own choose_c optimum, shared by prove_multichip
    and run_sharded_prove so the Horner ladder and the pipeline agree
    (round-1/2 carried both MSMs on the grouped-G1 c)."""
    return msm_ops.choose_c(min(n_pts // d, max_lanes // 2), groups=1)


# ---------------------------------------------------------------- padding

def _pad_last(arr, mult: int):
    pad = (-arr.shape[-1]) % mult
    if pad == 0:
        return arr
    widths = [(0, 0)] * (arr.ndim - 1) + [(0, pad)]
    return jnp.pad(arr, widths)


def pad_cache_for_mesh(cache, n_devices: int):
    """Pad all sharded-axis arrays to multiples of the mesh size.

    Points pad with the (0,0) infinity encoding (exact MSM identity),
    scalars/records pad with zeros, padded coefficient records target
    the dead segment `2*domain_size`.
    """
    d = n_devices
    plan = cache.plan

    n_rec = plan.coefs.shape[-1]
    pad_rec = (-n_rec) % d
    coefs = _pad_last(plan.coefs, d)
    wit_idx = jnp.pad(plan.witness_idx, (0, pad_rec))
    segments = jnp.pad(
        plan.segments, (0, pad_rec), constant_values=plan.num_segments - 1
    )

    # precomputed bases carry `pre` interleaved copies per scalar lane:
    # padding to d*pre keeps every device shard = pre x its scalar shard
    # (contiguous copy blocks never split across devices)
    p1 = getattr(cache, "msm_pre", 1)
    p2 = getattr(cache, "msm_pre2", 1)
    pads = {
        "coefs": coefs,
        "wit_idx": wit_idx,
        "segments": segments,
        "pa": tuple(_pad_last(a, d * p1) for a in cache.points_a),
        "pb1": tuple(_pad_last(a, d * p1) for a in cache.points_b1),
        "pb2": tuple(_pad_last(a, d * p2) for a in cache.points_b2),
        "pc": tuple(_pad_last(a, d * p1) for a in cache.points_c),
        "ph": tuple(_pad_last(a, d * p1) for a in cache.points_h),
    }
    return pads


def prove_multichip(mesh, wtns_path: str, cache, deterministic: bool = False,
                    rng=None, c: int | None = None, k: int = 32):
    """Full multi-chip prove: sharded device phases + host assembly.

    Bit-exact with the single-chip pipeline at any device count (the
    MSM combine order is fixed; EC arithmetic is exact)."""
    from ..io.wtns import WtnsFile
    from ..refmath import curve as cv
    from ..refmath.field import R_MOD
    from ..refmath.groth16 import serialize_proof

    hdr = cache.header
    wtns = WtnsFile(wtns_path)
    if wtns.header.q != hdr.r:
        raise ValueError("witness curve does not match proving key")
    if wtns.header.n_witness != hdr.n_vars:
        raise ValueError(
            f"invalid witness length: circuit {hdr.n_vars}, witness {wtns.header.n_witness}"
        )
    witness = lb.u32x8_to_limbs_device(jnp.asarray(wtns.witness_limbs()))

    n_pts = witness.shape[-1] + ((-witness.shape[-1]) % mesh.devices.size)
    d = mesh.devices.size
    # precomputed caches bake their window sizes (the copies are shifted
    # for exactly cache.msm_c / msm_c2); plain caches choose here
    if getattr(cache, "msm_pre", 1) > 1:
        c = cache.msm_c
    else:
        c = c or cache.msm_c or msm_ops.choose_c(
            min(4 * n_pts // d, msm_ops.MSM_MAX_LANES), groups=4
        )
    if getattr(cache, "msm_pre2", 1) > 1:
        c2 = cache.msm_c2
    else:
        c2 = _choose_c2(n_pts, d, msm_ops.MSM_MAX_LANES)
    _h, ws_g1, ws_b2 = run_sharded_prove(mesh, cache, witness, c=c, c2=c2, k=k)

    ws_g1 = np.asarray(ws_g1)  # one bulk fetch for all four G1 groups
    pi_a = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 0), c)
    pi_b1 = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 1), c)
    pi_c = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 2), c)
    pi_h = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 3), c)
    pi_b = msm_ops.horner_combine(
        msm_ops.window_points_to_host_g2(ws_b2, 0), c2, g2=True
    )

    alpha1 = cv.g1_from_affine(hdr.vk_alpha_1)
    beta1 = cv.g1_from_affine(hdr.vk_beta_1)
    delta1 = cv.g1_from_affine(hdr.vk_delta_1)
    beta2 = cv.g2_from_affine(hdr.vk_beta_2)
    delta2 = cv.g2_from_affine(hdr.vk_delta_2)

    if deterministic:
        r = s = 1
    else:
        import secrets

        r = (rng or secrets).randbelow(R_MOD)
        s = (rng or secrets).randbelow(R_MOD)

    pi_a = cv.g1_add(pi_a, cv.g1_add(alpha1, cv.g1_mul(delta1, r)))
    pi_b = cv.g2_add(pi_b, cv.g2_add(beta2, cv.g2_mul(delta2, s)))
    pi_b1 = cv.g1_add(pi_b1, cv.g1_add(beta1, cv.g1_mul(delta1, s)))
    pi_c = cv.g1_add(pi_c, pi_h)
    pi_c = cv.g1_add(pi_c, cv.g1_mul(pi_a, s))
    pi_c = cv.g1_add(pi_c, cv.g1_mul(pi_b1, r))
    pi_c = cv.g1_add(pi_c, cv.g1_neg(cv.g1_mul(delta1, r * s % R_MOD)))

    public_signals = [str(v) for v in wtns.witness_ints(1, hdr.n_public)]
    return serialize_proof(pi_a, pi_b, pi_c), public_signals


def run_sharded_prove(mesh, cache, witness, c: int | None = None, k: int = 32,
                      max_lanes: int | None = None, c2: int | None = None,
                      log=None):
    """Full multi-chip device phase; returns (h_sharded, g1 window sums,
    g2 window sums).

    `witness`: (16, n_vars) standard-form limbs (unpadded).
    `log`: optional callable(str) — per-step build/dispatch progress
    (the driver dryrun uses it to leave a compile-attribution tail).
    """
    import time as _time

    from .mesh import globalize

    _t0 = _time.time()
    _log = log or (lambda m: None)

    d = mesh.devices.size
    hdr = cache.header
    pads = pad_cache_for_mesh(cache, d)
    wit_pad = _pad_last(witness, d)
    wit_c = _pad_last(witness[:, hdr.n_public + 1 :], d)

    pre = getattr(cache, "msm_pre", 1)
    pre2 = getattr(cache, "msm_pre2", 1)
    n_pts = pads["pa"][0].shape[-1]  # point lanes (pre x scalars)
    max_lanes = max_lanes or msm_ops.MSM_MAX_LANES
    if pre > 1:
        c = cache.msm_c  # baked with the precomputed copies
    else:
        c = c or msm_ops.choose_c(min(4 * n_pts // d, max_lanes), groups=4)
    dom = ntt_ops.get_domain(hdr.power)
    if cache.plan.level2 is not None:
        seg2, nseg2 = cache.plan.level2
    else:
        seg2, nseg2 = jnp.zeros((1,), jnp.int32), 0

    # multi-process (DCN) ingest: every sharded-axis input becomes a
    # GLOBAL array assembled from this process's contiguous slice
    # (mesh.globalize -> host_local_to_global); single-process this is
    # a passthrough and jit places the arrays. Replicated inputs
    # (witness, seg2, domain tables) are globalized whole.
    rep = P()
    g1 = P(None, AXIS)
    g2 = P(None, None, AXIS)
    wit_pad = globalize(mesh, rep, wit_pad)
    wit_c = globalize(mesh, g1, wit_c)
    seg2_g = globalize(mesh, rep, seg2)
    coefs = globalize(mesh, g1, pads["coefs"])
    wit_idx = globalize(mesh, P(AXIS), pads["wit_idx"])
    segments = globalize(mesh, P(AXIS), pads["segments"])
    pa, pb1, pc, ph = (
        tuple(globalize(mesh, g1, a) for a in pads[kk])
        for kk in ("pa", "pb1", "pc", "ph")
    )
    pb2 = tuple(globalize(mesh, g2, a) for a in pads["pb2"])

    step_a = build_r1cs_coset_step(mesh, hdr.power, cache.plan.num_segments, nseg2)
    keys = globalize(mesh, rep, cache.keys)  # natural order on both paths
    tw_fwd = globalize(mesh, rep, dom.tw_fwd)
    tw_inv = globalize(mesh, rep, dom.tw_inv)
    n_inv = globalize(mesh, rep, dom.n_inv_mont)
    h = step_a(
        wit_pad, coefs, wit_idx, segments, seg2_g,
        keys, tw_fwd, tw_inv, n_inv,
    )
    _log(f"step A traced+compiled+dispatched ({_time.time()-_t0:.1f}s)")

    step_b = build_msm_g1_step(mesh, c, k, max_lanes, pre)
    ws_g1 = step_b(wit_pad, wit_c, h, pa, pb1, pc, ph)
    _log(f"step B traced+compiled+dispatched ({_time.time()-_t0:.1f}s)")
    if pre2 > 1:
        c2 = cache.msm_c2
    else:
        c2 = c2 or _choose_c2(n_pts, d, max_lanes)
    step_c = build_msm_g2_step(mesh, c2, k, max(max_lanes // 2, 1), pre2)
    ws_b2 = step_c(wit_pad, pb2)
    _log(f"step C traced+compiled+dispatched ({_time.time()-_t0:.1f}s)")
    return h, ws_g1, ws_b2
