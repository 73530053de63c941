"""Static HBM residency budget for a warm prove (VERDICT r3 item 7).

Computes, from the SAME constants the runtime uses (choose_c_pre,
MSM_PRE_BUDGET, MSM_MAX_LANES, SPLIT_NTT_POWER), the bytes each
component of a warm ZKeyCache + in-flight MSM slice occupies, so the
static knobs can be read against one stated budget instead of being
independent env defaults. Host-only (no device).

Usage: python tools/hbm_budget.py [--hbm-gb 16]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

FQ = 64            # bytes per field element in limb layout (16 x u32)
GB = 1 << 30


def budget(log_n: int, n_coef_per_n: float = 2.0):
    from icicle_snark_tpu.ops import msm as m

    n = 1 << log_n
    n_vars = n          # complex-N: n_vars ~ n
    npub = 1
    total_g1 = 3 * n_vars - (npub + 1) + n
    c1, pre1 = m.choose_c_pre(total_g1, groups=4,
                              budget_bytes=2 * m.MSM_PRE_BUDGET // 3)
    c2, pre2 = m.choose_c_pre(n_vars, groups=1, g2=True,
                              budget_bytes=m.MSM_PRE_BUDGET // 3)
    n_coef = int(n_coef_per_n * n)

    rows = []

    def row(name, nbytes, note=""):
        rows.append((name, nbytes, note))

    g1_pts = (3 * n_vars - (npub + 1) + n) * pre1
    row("G1 bases (a+b1+c+h)", 2 * FQ * g1_pts, f"c={c1} f={pre1}")
    row("G2 bases (b2)", 4 * FQ * n_vars * pre2, f"c={c2} f={pre2}")
    row("coset keys (natural only)", FQ * n, "bitrev derived in-graph")
    row("domain tw_fwd+tw_inv", 2 * FQ * n, "")
    row("R1CS plan coefs", FQ * n_coef, f"~{n_coef_per_n:g} records/constraint")
    row("R1CS plan idx+segments", 8 * n_coef, "")
    row("MXU Toeplitz pools", 2 * (128 * 128 + 128 * 128) * 64, "stage+leaf, fwd+inv (approx)")

    resident = sum(b for _, b, _ in rows)

    # in-flight MSM slice working set (one window pipeline):
    # gathered packed payload + sorted keys/order + prefix levels
    # (projective inclusive prefixes, 3 coords) + windows' p_end stack.
    L = min(g1_pts, m.MSM_MAX_LANES)
    w_total = -(-256 // c1)
    wp = -(-w_total // pre1)
    n_buckets = (1 << (c1 - 1)) + 1
    work = (
        FQ * L                      # rows_t packed payload (2 coords, 16-bit packed)
        + FQ * L                    # gathered slice copy
        + 8 * L                     # argsort keys + order (2 x i32)
        + 3 * FQ * L                # prefix level-0 (projective, packed/2 -> upper bound full)
        + 3 * FQ * wp * 4 * n_buckets  # p_end stack (W, G=4, B)
    )
    row("MSM slice working set", work, f"L={L:,} lanes wp={wp} B={n_buckets}")
    return rows, resident, work


def main():
    hbm = 16.0
    for i, a in enumerate(sys.argv):
        if a == "--hbm-gb":
            hbm = float(sys.argv[i + 1])
    for log_n in (17, 21, 22):
        rows, resident, work = budget(log_n)
        print(f"\n== domain 2^{log_n} (complex-{1 << log_n >> 10}k-class) ==")
        for name, b, note in rows:
            print(f"  {name:<28} {b / GB:7.3f} GB  {note}")
        print(f"  {'TOTAL resident':<28} {resident / GB:7.3f} GB")
        print(f"  {'resident + slice in-flight':<28} {(resident + work) / GB:7.3f} GB"
              f"  (HBM {hbm:g} GB -> margin {hbm - (resident + work) / GB:.1f} GB)")


if __name__ == "__main__":
    main()
