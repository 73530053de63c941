"""Multi-chip Groth16 prove step: shard_map over the `data` mesh axis.

Parallel axes (SURVEY.md section 2.7 mapping):
  * R1CS evaluation — records sharded; per-device limb-wise
    segment_sum partials combined with an EXACT integer `psum`
    (every 16-bit limb column receives < 2^16 terms globally, so the
    uint32 lazy sum never overflows across devices either).
  * 5 MSMs — points/scalars sharded (the data-parallel axis); local
    Pippenger window sums all_gathered and tree-reduced in a fixed
    order so results are bit-exact at any device count.
  * NTT — computed replicated per device for now (domain sizes that
    fit one chip); the all_to_all four-step NTT replaces this for
    multi-host domains.

All shapes entering shard_map must be divisible by the mesh size; the
cache pads points with the (0,0) infinity encoding and scalars with
zeros, both of which are exact no-ops for MSM.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..curve import jcurve as jc
from ..fields import limbs as lb
from ..fields.limbs import FR_SPEC
from ..ops import msm as msm_ops
from ..ops import ntt as ntt_ops
from .mesh import AXIS
from .msm_shard import msm_window_sums_local

_R2_FR = None  # set lazily to avoid import cycle


def _r2():
    global _R2_FR
    if _R2_FR is None:
        from ..refmath.field import MONT_R_FR, R_MOD

        _R2_FR = lb.const_limbs(MONT_R_FR * MONT_R_FR % R_MOD, (1,))
    return _R2_FR


def _local_slice(arr, axis: int):
    """Slice this device's shard out of a replicated array."""
    d = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    size = arr.shape[axis] // d
    return jax.lax.dynamic_slice_in_dim(arr, idx * size, size, axis=axis)


def build_sharded_prove_step(mesh, log_n: int, num_segments: int, c: int, k: int = 32):
    """Returns a jitted function over sharded inputs computing
    (h_scalars, 5x window-sum tuples). Host Horner + randomization
    happen outside (O(1) work)."""

    n = 1 << log_n

    def step(
        witness,        # (16, n_vars_padded)  replicated
        coefs,          # (16, n_coef_local*D) sharded on records
        wit_idx,        # (n_coef,)            sharded
        segments,       # (n_coef,)            sharded (global ids)
        keys_bitrev,    # (16, n)              replicated
        tw_fwd, tw_inv, n_inv_mont,  # domain   replicated
        pa, pb1, pc, ph,  # G1 point pairs (x, y): (16, n_*) sharded
        pb2,            # G2 point pair: (2, 16, n_vars) sharded
        wit_c,          # (16, n_c_padded)     sharded (private-signal slice)
    ):
        # ---- R1CS eval: local partial segment sums, exact integer psum
        wit_g = jnp.take(witness, wit_idx, axis=1)
        prod = lb.mont_mul(coefs, wit_g, FR_SPEC)
        cols = jax.vmap(
            lambda row: jax.ops.segment_sum(row, segments, num_segments=num_segments)
        )(prod)
        cols = jax.lax.psum(cols, AXIS)
        cols = jnp.concatenate([cols, jnp.zeros((1,) + cols.shape[1:], lb.U32)], axis=0)
        ab = lb.redc_wide(cols, FR_SPEC)
        a_vals, b_vals = ab[:, :n], ab[:, n : 2 * n]
        c_vals = lb.mont_mul(a_vals, b_vals, FR_SPEC)

        # ---- coset evaluation (replicated batch-3 NTT)
        vec = jnp.stack([a_vals, b_vals, c_vals], axis=1)
        coeffs_br = ntt_ops.intt_dif(vec, tw_inv, n_inv_mont)
        shifted = lb.mont_mul(coeffs_br, keys_bitrev[:, None, :], FR_SPEC)
        odd = ntt_ops.ntt_dit(shifted, tw_fwd)
        h_raw = lb.sub_mod(
            lb.mont_mul(odd[:, 0], odd[:, 1], FR_SPEC), odd[:, 2], FR_SPEC
        )
        h = lb.mont_mul(h_raw, _r2(), FR_SPEC)

        # ---- 5 sharded MSMs: 4 G1 groups in ONE pipeline + G2
        wit_local = _local_slice(witness, 1)
        h_local = _local_slice(h, 1)
        ws_g1 = msm_window_sums_local(
            [wit_local, wit_local, wit_c, h_local],
            [pa, pb1, pc, ph],
            jc.FqOps, c, k,
        )  # (16, 4, W)
        ws_b2 = msm_window_sums_local([wit_local], [pb2], jc.Fq2Ops, c, k)
        return h, ws_g1, ws_b2

    g1 = P(None, AXIS)
    g2 = P(None, None, AXIS)
    rep = P()
    in_specs = (
        rep,                # witness
        g1,                 # coefs
        P(AXIS), P(AXIS),   # wit_idx, segments
        rep, rep, rep, rep, # keys, twiddles
        (g1, g1), (g1, g1), (g1, g1), (g1, g1),  # pa, pb1, pc, ph
        (g2, g2),           # pb2
        g1,                 # wit_c
    )
    # window sums are single stacked arrays (3, coords..., G, W)
    out_specs = (rep, rep, rep)

    # check_vma=False: the MSM scan carries start replicated (identity
    # points) and become device-varying after the first scanned shard
    # element — a pattern the static varying-axis checker can't type.
    stepped = jax.shard_map(
        step, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    return jax.jit(stepped)


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

    pads = {
        "coefs": coefs,
        "wit_idx": wit_idx,
        "segments": segments,
        "pa": tuple(_pad_last(a, d) for a in cache.points_a),
        "pb1": tuple(_pad_last(a, d) for a in cache.points_b1),
        "pb2": tuple(_pad_last(a, d) for a in cache.points_b2),
        "pc": tuple(_pad_last(a, d) for a in cache.points_c),
        "ph": tuple(_pad_last(a, d) for a in cache.points_h),
    }
    return pads


def prove_multichip(mesh, wtns_path: str, cache, deterministic: bool = False,
                    rng=None, c: int | None = None, k: int = 32):
    """Full multi-chip prove: sharded device phase + host assembly.

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
    c = c or msm_ops.choose_c(4 * n_pts // d, groups=4)
    _h, ws_g1, ws_b2 = run_sharded_prove(mesh, cache, witness, c=c, k=k)

    ws_g1 = np.asarray(ws_g1)  # one bulk fetch for all four G1 groups
    pi_a = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 0), c)
    pi_b1 = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 1), c)
    pi_c = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 2), c)
    pi_h = msm_ops.horner_combine(msm_ops.window_points_to_host_g1(ws_g1, 3), c)
    pi_b = msm_ops.horner_combine(msm_ops.window_points_to_host_g2(ws_b2, 0), c, g2=True)

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


def run_sharded_prove(mesh, cache, witness, c: int | None = None, k: int = 32):
    """Full multi-chip device phase; returns (h_scalars, window sums x5).

    `witness`: (16, n_vars) standard-form limbs (unpadded).
    """
    d = mesh.devices.size
    hdr = cache.header
    pads = pad_cache_for_mesh(cache, d)
    wit_pad = _pad_last(witness, d)
    wit_c = _pad_last(witness[:, hdr.n_public + 1 :], d)

    n_pts = pads["pa"][0].shape[-1]
    c = c or msm_ops.choose_c(4 * n_pts // d, groups=4)
    dom = ntt_ops.get_domain(hdr.power)
    step = build_sharded_prove_step(
        mesh, hdr.power, cache.plan.num_segments, c, k
    )
    return step(
        wit_pad, pads["coefs"], pads["wit_idx"], pads["segments"],
        cache.keys_bitrev, dom.tw_fwd, dom.tw_inv, dom.n_inv_mont,
        pads["pa"], pads["pb1"], pads["pc"], pads["ph"], pads["pb2"], wit_c,
    )
