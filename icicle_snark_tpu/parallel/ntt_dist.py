"""Distributed four-step NTT over the device mesh.

The multi-chip answer to the reference's hierarchical NTT decomposition
(CPU H0/H1 split, /root/reference/icicle/backend/cpu/include/ntt_cpu.h:66-110;
CUDA mixed-radix stages, mixed_radix_ntt.cu:755-910): a length-n
transform over a D-device mesh as

  view x[i1*n2 + i2] as a matrix A[i1][i2], n = n1*n2, SHARDED on i2
  1. local column NTTs  (length n1, batch B*n2/D)
  2. twiddle multiply   A[k1][i2] *= w_n^(k1*i2)   (local gather)
  3. all_to_all         reshard i2-sharded -> k1-sharded   (ICI)
  4. local row NTTs     (length n2, batch B*n1/D)
  5. all_to_all + local transpose -> NATURAL order, contiguous-sharded

Natural order in and out, so it is a drop-in replacement for the
single-chip transform; the Groth16 pipeline can later fuse steps 5/1
of consecutive transforms away (the distributed analog of the
reorder-free bitrev trick in ops/ntt.py).

All functions here run INSIDE shard_map: inputs/outputs are local
blocks of a (16, B, n1, n2) global array sharded on the LAST axis
(in) / re-sharded as documented (out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import limbs as lb
from ..fields.limbs import FR_SPEC, NLIMB
from ..ops import ntt as ntt_ops
from .mesh import AXIS


def _local_ntt_last(x, tw, inverse: bool, n_inv_mont):
    """Natural-order NTT along the last axis of (16, B', L)."""
    rev = jnp.asarray(ntt_ops.bitrev_permutation(x.shape[-1].bit_length() - 1))
    if inverse:
        return ntt_ops.intt_dif(x, tw, n_inv_mont)[..., rev]
    return ntt_ops.ntt_dit(x[..., rev], tw)


def ntt_four_step_partial(x_local, tw1, tw2, tw_full, n_inv1, n_inv2,
                          log_n1: int, log_n2: int, inverse: bool):
    """Steps 1-4 of the four-step NTT: output left in the INTERMEDIATE
    [k1 block][k2] layout, i.e. local (16, B, n1/D, n2) holding
    X[k1 + n1*k2] at [k1_loc][k2]. The Groth16 coset pipeline consumes
    this order directly (pointwise key multiply + a swapped-factor
    forward transform), fusing away the final all_to_all — the
    distributed analog of the single-chip reorder-free bitrev trick
    (ops/ntt.py module docstring).

    x_local: (16, B, n1, n2/D) — the i2-sharded block.
    tw1/tw2: (16, n1) / (16, n2) domain power tables (fwd or inv).
    tw_full: (16, n) full-size table for the inter-step twiddles.
    """
    nlimb, batch, n1, n2_loc = x_local.shape
    n2 = 1 << log_n2
    n = n1 * n2
    d = jax.lax.axis_size(AXIS)
    my = jax.lax.axis_index(AXIS)

    # ---- step 1: column NTTs over i1 (bring i1 last)
    t = jnp.swapaxes(x_local, -1, -2)  # (16, B, n2/D, n1)
    t = t.reshape(nlimb, batch * n2_loc, n1)
    t = _local_ntt_last(t, tw1, inverse, n_inv1)
    t = t.reshape(nlimb, batch, n2_loc, n1)  # [i2_loc][k1]

    # ---- step 2: twiddle w_n^(±k1 * i2_global)
    i2 = my * n2_loc + jnp.arange(n2_loc)  # (n2/D,)
    k1 = jnp.arange(n1)
    exp = (i2[:, None] * k1[None, :]) % n  # (n2/D, n1)
    tw = tw_full[:, exp]  # (16, n2/D, n1); table is fwd or inv to match
    t = lb.mont_mul(t, tw[:, None, :, :], FR_SPEC)

    # ---- step 3: reshard i2-sharded -> k1-sharded
    # local (16, B, n2/D, n1): split k1 (axis 3) across devices,
    # gather full i2 (axis 2)
    t = jax.lax.all_to_all(t, AXIS, split_axis=3, concat_axis=2, tiled=True)
    # now (16, B, n2, n1/D) = [i2 full][k1 block]

    # ---- step 4: row NTTs over i2 (bring i2 last)
    n1_loc = n1 // d
    t = jnp.swapaxes(t, -1, -2)  # (16, B, n1/D, n2)
    t = t.reshape(nlimb, batch * n1_loc, n2)
    t = _local_ntt_last(t, tw2, inverse, n_inv2)
    return t.reshape(nlimb, batch, n1_loc, n2)  # [k1 block][k2]


def ntt_four_step_local(x_local, tw1, tw2, tw_full, n_inv1, n_inv2,
                        log_n1: int, log_n2: int, inverse: bool):
    """One device's slice of the four-step NTT (NATURAL-order output).

    x_local: (16, B, n1, n2/D) — the i2-sharded block.
    Returns the natural-order result block (16, B, n1*n2/D), sharded
    contiguously on the flat index (i.e. PartitionSpec last-axis again).
    """
    nlimb, batch, n1, n2_loc = x_local.shape
    t = ntt_four_step_partial(
        x_local, tw1, tw2, tw_full, n_inv1, n_inv2, log_n1, log_n2, inverse
    )

    # ---- step 5: transpose to NATURAL order X[k1 + n1*k2]
    # natural contiguous chunk c holds k2 in block c (since flat index
    # = k1 + n1*k2): reshard k1-sharded -> k2-sharded, then local
    # transpose to [k2_loc][k1]; flat local index k2_loc*n1 + k1 is
    # then exactly the device's contiguous chunk of natural order.
    t = jax.lax.all_to_all(t, AXIS, split_axis=3, concat_axis=2, tiled=True)
    # (16, B, n1, n2/D) = [k1 full][k2 block]
    t = jnp.swapaxes(t, -1, -2)  # (16, B, n2/D, n1) = [k2_loc][k1]
    return t.reshape(nlimb, batch, n2_loc * n1)


def split_logs(log_n: int, d: int) -> tuple:
    """(log_n1, log_n2) four-step factorization for a D-device mesh.
    Both factors must be divisible by D for the all_to_alls to tile."""
    log_n2 = max((log_n + 1) // 2, (d - 1).bit_length())
    log_n1 = log_n - log_n2
    return log_n1, log_n2


def can_distribute(log_n: int, d: int) -> bool:
    log_n1, log_n2 = split_logs(log_n, d)
    return (1 << log_n1) % d == 0 and (1 << log_n2) % d == 0


def make_dist_ntt(mesh, log_n: int, batch: int, inverse: bool = False):
    """Build a jitted natural-order distributed NTT over `mesh`.

    Input/output: global (16, B, n) sharded contiguously on the last
    axis (PartitionSpec(None, None, AXIS)).
    """
    from jax.sharding import PartitionSpec as P

    d = mesh.devices.size
    n = 1 << log_n
    log_n1, log_n2 = split_logs(log_n, d)
    n1, n2 = 1 << log_n1, 1 << log_n2
    assert n1 % d == 0 and n2 % d == 0, "mesh too large for this domain"

    dom1 = ntt_ops.get_domain(log_n1)
    dom2 = ntt_ops.get_domain(log_n2)
    dom = ntt_ops.get_domain(log_n)
    if inverse:
        tw1, tw2, twf = dom1.tw_inv, dom2.tw_inv, dom.tw_inv
    else:
        tw1, tw2, twf = dom1.tw_fwd, dom2.tw_fwd, dom.tw_fwd

    def fn(x):
        # input viewed (16, B, n1, n2), sharded on i2 (the fast axis);
        # output arrives natural-order, contiguously sharded on n
        x = x.reshape(NLIMB, batch, n1, n2)
        return jax.shard_map(
            lambda xl: ntt_four_step_local(
                xl, tw1, tw2, twf, dom1.n_inv_mont, dom2.n_inv_mont,
                log_n1, log_n2, inverse,
            ),
            mesh=mesh,
            in_specs=P(None, None, None, AXIS),
            out_specs=P(None, None, AXIS),
            check_vma=False,
        )(x)

    return jax.jit(fn)
