"""RNS representation layer vs python-int oracle."""

import secrets

import jax.numpy as jnp
import numpy as np

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.fields import rns

SPEC = rns.DEFAULT_SPEC
N = 32


def test_moduli_coprime_and_large():
    q = [int(v) for v in SPEC.q]
    assert len(set(q)) == len(q)
    assert SPEC.M > (1 << 258)  # covers BN254 values with margin


def test_roundtrip_and_channel_ops():
    vals = [secrets.randbelow(1 << 256) for _ in range(N)]
    limbs = jnp.asarray(lb.ints_to_limbs_np(vals))
    res = rns.to_rns(limbs, SPEC)
    back = rns.from_rns_host(np.asarray(res), SPEC)
    assert back == [v % SPEC.M for v in vals]

    a = res[: N // 2]
    b = res[N // 2 :]
    va, vb = vals[: N // 2], vals[N // 2 :]

    s = rns.from_rns_host(np.asarray(rns.rns_add(a, b, SPEC)), SPEC)
    assert s == [(x + y) % SPEC.M for x, y in zip(va, vb)]

    d = rns.from_rns_host(np.asarray(rns.rns_sub(a, b, SPEC)), SPEC)
    assert d == [(x - y) % SPEC.M for x, y in zip(va, vb)]

    m = rns.from_rns_host(np.asarray(rns.rns_mul(a, b, SPEC)), SPEC)
    assert m == [(x * y) % SPEC.M for x, y in zip(va, vb)]


def test_mont_mul_exact():
    """RNS-Montgomery product vs python ints, including the redundant
    (< ~2p) domain staying closed under repeated multiplication."""
    from icicle_snark_tpu.fields.rns import mont_ctx_fq
    from icicle_snark_tpu.refmath.field import Q

    ctx = mont_ctx_fq()
    M_A = ctx.A.M
    n = 16
    xs = [secrets.randbelow(Q) for _ in range(n)]
    ys = [secrets.randbelow(Q) for _ in range(n)]
    # adversarial edges
    xs[:4] = [0, 1, Q - 1, Q - 1]
    ys[:4] = [5, 0, Q - 1, 1]

    X = ctx.to_rns2(jnp.asarray(lb.ints_to_limbs_np(xs)))
    Y = ctx.to_rns2(jnp.asarray(lb.ints_to_limbs_np(ys)))
    RA, RB = ctx.mont_mul(X, Y)
    got = ctx.from_rns2_host(RA)
    gotB = rns.from_rns_host(np.asarray(RB), ctx.B)
    minv = pow(M_A, -1, Q)
    for g, gb, x, y in zip(got, gotB, xs, ys):
        assert g == gb, "base A/B disagree"
        assert g < 3 * Q, f"redundant bound violated: {g}"
        assert g % Q == (x * y * minv) % Q

    # closure: multiply results together repeatedly (values < ~2p)
    R1 = (RA, RB)
    R2 = ctx.mont_mul(R1, R1)
    v1 = ctx.from_rns2_host(R1[0])
    got2 = ctx.from_rns2_host(R2[0])
    for g2, v in zip(got2, v1):
        assert g2 < 3 * Q
        assert g2 % Q == (v * v * minv) % Q
