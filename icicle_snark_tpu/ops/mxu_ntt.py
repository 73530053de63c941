"""MXU matmul-NTT: four-step NTT whose sub-DFTs are int8 matmuls.

The TPU answer to the reference's mixed-radix CUDA NTT
(/root/reference/icicle/backend/cuda/src/ntt/mixed_radix_ntt.cu:160-1019):
instead of radix-64 butterfly kernels, each radix-R stage applies the
size-R DFT as a MATRIX MULTIPLY against a constant twiddle matrix —
exactly the shape the 128x128 systolic MXU wants (measured ~200-400
Tops/s vs ~0.5 T u32 op/s on the VPU; tools/vpu_ceiling_probe.py).

Exact integer arithmetic on a float/int8 matrix unit via digit
decomposition (all bounds are stated inline and tested):

  * Field elements (16x16-bit Montgomery limbs) are split into
    D7 = 37 seven-bit digits — int8-exact operands.
  * The DFT matrix W (entries w^(ik) * R mod p, Montgomery-scaled so
    the final REDC restores the operand's Montgomery factor) is split
    the same way and laid out as a constant BLOCK-TOEPLITZ int8 matrix
    T[(d, i), (k, e)] = digit_{e-d}(W[i, k]): one int8 matmul then
    computes every product-digit column
        P[m, (k, e)] = sum_{d,i} x_d[m, i] * W_{e-d}[i, k]
    with int32 accumulation (exact: <= D7*R terms * 127^2 < 2^27.2
    for R <= 256).
  * A second constant int8 matmul folds the 73 product columns back to
    a 254-bit magnitude: columns are re-split into 7-bit planes and
    multiplied against digits of (2^(7s) mod p) — a mod-p congruence,
    not a division, so no stray Montgomery factors.
  * Carry normalization + one redc_wide (divides by R, repaying the
    Montgomery scale of W) returns canonical 16-bit limbs.

Large transforms recurse four-step: column DFTs (radix <= 2^LOG_R) ->
inter-step twiddles (VPU mont_mul against a cached table) -> row
transform recursion -> natural-order transpose, mirroring the
reference's hierarchical decomposition (ntt_cpu.h:66-110).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limbs as lb
from ..fields.limbs import FR_SPEC, NLIMB, U32
from ..refmath.field import W as ROOT_TOWER
from . import ntt as ntt_ops

DBITS = 7
D7 = -(-256 // DBITS)  # 37 digit planes cover 2^259 > 2p
E7 = 2 * D7 - 1            # 73 product-digit columns
LOG_R = 7                  # preferred stage radix 128 (leaves may be 256)
MAX_LEAF_LOG = 8

# chunk of batch rows processed per lax.map step (bounds the int32
# intermediate: CHUNK_M x (R * E7) x 4 B ~= 76 MB at R=128)
CHUNK_M = int(__import__("os").environ.get("ISTPU_MXU_NTT_CHUNK", "2048"))


def _int_to_digits7(v: int, n: int = D7) -> np.ndarray:
    return np.array([(v >> (DBITS * i)) & 0x7F for i in range(n)], dtype=np.int8)


def _split7_u32(x: jnp.ndarray) -> jnp.ndarray:
    """(16, ...) canonical 16-bit limbs -> (..., D7) int8 7-bit digits.

    Digit j covers bits [7j, 7j+7) of the 256-bit value; limbs are
    16-bit so a digit straddles at most two limbs."""
    outs = []
    for j in range(D7):
        bit = j * DBITS
        limb, off = bit // 16, bit % 16
        d = x[limb] >> np.uint32(off)
        if off + DBITS > 16 and limb + 1 < NLIMB:
            d = d | (x[limb + 1] << np.uint32(16 - off))
        outs.append(d & np.uint32(0x7F))
    return jnp.stack(outs, axis=-1).astype(jnp.int8)


def _dft_toeplitz_const(w_int_matrix: np.ndarray) -> np.ndarray:
    """(r_in, r_out) python-int matrix (already Montgomery-scaled) ->
    block-Toeplitz int8 (D7*r_in, r_out*E7) with column index k*E7 + e."""
    r_in, r_out = w_int_matrix.shape
    digs = np.zeros((r_in, r_out, D7), dtype=np.int8)
    for i in range(r_in):
        for k in range(r_out):
            digs[i, k] = _int_to_digits7(int(w_int_matrix[i, k]))
    t = np.zeros((D7, r_in, r_out, E7), dtype=np.int8)
    for d in range(D7):
        # T[(d,i),(k,e)] = digit_{e-d}(W[i,k])
        t[d, :, :, d : d + D7] = digs
    return t.reshape(D7 * r_in, r_out * E7)


def _reduce_const() -> np.ndarray:
    """Constant int8 (E7*4, D7): row (e, j) holds the 7-bit digits of
    2^(7*(e+j)) mod p — the mod-p fold of the product columns."""
    p = FR_SPEC.modulus
    out = np.zeros((E7 * 4, D7), dtype=np.int8)
    for e in range(E7):
        for j in range(4):
            out[e * 4 + j] = _int_to_digits7(pow(2, DBITS * (e + j), p))
    return out


_REDUCE_CONST = None


def _reduce_const_cached():
    # cache NUMPY (not jnp): device conversion inside a jit trace would
    # capture a tracer in module state (UnexpectedTracerError on reuse)
    global _REDUCE_CONST
    if _REDUCE_CONST is None:
        _REDUCE_CONST = _reduce_const()
    return _REDUCE_CONST


def _columns7_to_canonical(cols: jnp.ndarray) -> jnp.ndarray:
    """(M, D7) int32 radix-2^7 columns (each < 2^23) -> (16, M)
    canonical Montgomery limbs via carry normalization, 16-bit
    regrouping and one redc_wide (x * R^-1 mod p — repaying the R
    baked into the DFT matrix)."""
    cols = cols.astype(jnp.uint32)
    m = cols.shape[0]

    # two carry passes: cols < 2^23 -> (<2^7 + carry<2^16) -> < 2^9;
    # carries past the top column are collected and folded below
    def carry_pass(cs):
        out = []
        carry = jnp.zeros((m,), U32)
        for t in range(cs.shape[-1]):
            v = cs[:, t] + carry
            out.append(v & np.uint32(0x7F))
            carry = v >> np.uint32(DBITS)
        return jnp.stack(out + [carry], axis=-1)  # width+1 columns

    c1 = carry_pass(cols)              # (M, D7+1), cols < 2^7 except top < 2^16
    # value < 2^(7*D7) * small: top carry column (index D7) weighs
    # 2^(7*D7) = 2^259; fold it via 2^259 mod p (value < 2^16 * p-ish)
    top = c1[:, D7]                    # < 2^16
    c1 = c1[:, :D7]
    fold = pow(2, DBITS * D7, FR_SPEC.modulus)
    fold_digs = _int_to_digits7(fold).astype(np.int32)
    folded = c1.astype(jnp.uint32) + top[:, None] * jnp.asarray(
        fold_digs, jnp.uint32
    )[None, :]
    # folded cols < 2^7 + 2^16*2^7 = 2^23: one more carry pass
    c2 = carry_pass(folded)            # (M, D7+1): top < ~2^16
    top2 = c2[:, D7]
    c2 = c2[:, :D7]
    folded2 = c2.astype(jnp.uint32) + top2[:, None] * jnp.asarray(
        fold_digs, jnp.uint32
    )[None, :]
    # folded2 < 2^23; numeric value < 2^259 + 2^16*p < 2^271 < R*p.
    # Regroup 7-bit-radix cols into 16-bit-radix cols: per column the
    # masked low fragment < 2^16 and the straddle fragment < 2^23-(16-off)
    # <= 2^22; <=3 fragments land in each 16-bit window -> cols < 2^24.
    cols16 = [jnp.zeros((m,), U32) for _ in range(NLIMB + 1)]
    for t in range(D7):
        bit = t * DBITS
        w, off = bit // 16, bit % 16
        v = folded2[:, t]
        lo = (v << np.uint32(off)) & np.uint32(0xFFFF)
        hi = v >> np.uint32(16 - off)  # off=0: v >> 16 (bits past limb w)
        cols16[w] = cols16[w] + lo
        if w + 1 <= NLIMB:
            cols16[w + 1] = cols16[w + 1] + hi
    wide = jnp.stack(cols16, axis=0)  # (17, M)
    return lb.redc_wide(wide, FR_SPEC)


def _dft_apply_chunk(x_chunk: jnp.ndarray, toeplitz: jnp.ndarray,
                     r_in: int, r_out: int) -> jnp.ndarray:
    """One chunk: (16, M, r_in) -> (16, M, r_out) via the two int8
    matmuls + canonicalization."""
    m = x_chunk.shape[1]
    digs = _split7_u32(x_chunk)                      # (M, r_in, D7)
    lhs = jnp.swapaxes(digs, -1, -2).reshape(m, D7 * r_in)  # (M, (d,i))
    p = jax.lax.dot_general(
        lhs, toeplitz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (M, r_out*E7), cols < D7*r_in*127^2 <= 2^27.2 (r_in <= 256)
    p = p.reshape(m * r_out, E7)
    # re-split int32 columns into 4x7-bit int8 planes (cols < 2^28)
    planes = []
    for j in range(4):
        planes.append(((p >> (DBITS * j)) & 0x7F).astype(jnp.int8))
    lhs2 = jnp.stack(planes, axis=-1).reshape(m * r_out, E7 * 4)
    cols = jax.lax.dot_general(
        lhs2, _reduce_const_cached(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (M*r_out, D7), cols < E7*4*127^2 < 2^22.2
    out = _columns7_to_canonical(cols)               # (16, M*r_out)
    return out.reshape(NLIMB, m, r_out)


def _dft_apply(x: jnp.ndarray, toeplitz: jnp.ndarray, r_in: int,
               r_out: int) -> jnp.ndarray:
    """(16, M, r_in) -> (16, M, r_out), chunked over M via lax.map so
    the int32 intermediates stay bounded (~CHUNK_M * r * E7 * 4 B)."""
    m = x.shape[1]
    if m <= CHUNK_M:
        return _dft_apply_chunk(x, toeplitz, r_in, r_out)
    nc = -(-m // CHUNK_M)
    pad = nc * CHUNK_M - m
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((NLIMB, pad, r_in), U32)], axis=1
        )
    xs = jnp.moveaxis(x.reshape(NLIMB, nc, CHUNK_M, r_in), 1, 0)
    out = jax.lax.map(
        lambda xc: _dft_apply_chunk(xc, toeplitz, r_in, r_out), xs
    )
    out = jnp.moveaxis(out, 0, 1).reshape(NLIMB, nc * CHUNK_M, r_out)
    return out[:, :m] if pad else out


# --------------------------------------------------------- constant caches

_TOEPLITZ_CACHE: dict = {}   # numpy, host: (log_r, inverse) -> int8 matrix
_MATS_DEVICE: dict = {}      # device: (log_n, inverse) -> (stage, leaf)


def _dft_matrix(log_r: int, inverse: bool) -> np.ndarray:
    """Block-Toeplitz int8 constant for the size-2^log_r DFT, entries
    Montgomery-scaled (w^(ik) * R mod p). Host numpy — the traced
    transform receives these as EXPLICIT jit arguments (closed-over
    arrays are inlined as HLO literals: a 2^21 step table as a dense
    literal blew the remote-compile request, HTTP 413)."""
    key = (log_r, inverse)
    if key not in _TOEPLITZ_CACHE:
        p = FR_SPEC.modulus
        r = 1 << log_r
        w = ROOT_TOWER[log_r]
        if inverse:
            w = pow(w, -1, p)
        rmod = FR_SPEC.r_mod
        mat = np.zeros((r, r), dtype=object)
        wi = [pow(w, i, p) for i in range(r)]
        for i in range(r):
            for k in range(r):
                mat[i, k] = wi[(i * k) % r] * rmod % p
        _TOEPLITZ_CACHE[key] = _dft_toeplitz_const(mat)
    return _TOEPLITZ_CACHE[key]


def _leaf_log(log_n: int) -> int:
    """The residual leaf size of the four-step decomposition."""
    ln = log_n
    while ln > MAX_LEAF_LOG:
        ln -= LOG_R
    return ln


def mxu_mats(log_n: int, inverse: bool) -> tuple:
    """(stage, leaf) device Toeplitz matrices for a size-2^log_n
    transform — pass these INTO the jitted transform as arguments
    (device arrays as args become executable parameters; closures
    would be inlined as giant HLO literals). Eager-only: never call
    inside a trace."""
    key = (log_n, inverse)
    if key not in _MATS_DEVICE:
        _MATS_DEVICE[key] = (
            jnp.asarray(_dft_matrix(LOG_R, inverse)),
            jnp.asarray(_dft_matrix(_leaf_log(log_n), inverse)),
        )
    return _MATS_DEVICE[key]


def _step_twiddle_exp(top_log: int, ln: int) -> jnp.ndarray:
    """(n1, n2) int32 exponent matrix for level-ln inter-stage twiddles,
    built IN-GRAPH from iotas: w_{2^ln}^(k1*i2) = w_top^(stride*k1*i2)
    with stride = 2^(top-ln), so the (16, n_top) domain table passed as
    a jit argument serves every recursion level (no per-level cached
    tables -> nothing to inline). Bounds: k1 < 2^7, (i2*stride) %
    n_top... i2*stride <= 2^(top-7) and k1*e2 < 2^(top+7) — int32-safe
    through top_log = 24."""
    n_top = 1 << top_log
    n1 = 1 << LOG_R
    n2 = 1 << (ln - LOG_R)
    stride = 1 << (top_log - ln)
    k1 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0)
    i2 = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1)
    e2 = (i2 * jnp.int32(stride)) % jnp.int32(n_top)
    return (k1 * e2) % jnp.int32(n_top)


def _ensure_constants(log_n: int, inverse: bool):
    """Build every eager constant the (traced) transform needs: the
    device Toeplitz matrices (handed to the jit as ARGUMENTS), the
    mod-p fold matrix, and the NTT domain. Must run OUTSIDE jit:
    get_domain builds twiddles on device and a trace-time build would
    cache tracers."""
    mxu_mats(log_n, inverse)
    _reduce_const_cached()
    ntt_ops.get_domain(log_n)


def release_constants():
    """Free every module-held device constant (Toeplitz digit
    matrices). Called from CacheManager.evict / ntt.release_domain —
    domain-derived device arrays must not outlive the domain."""
    global _REDUCE_CONST
    _TOEPLITZ_CACHE.clear()
    _MATS_DEVICE.clear()
    _REDUCE_CONST = None


# ------------------------------------------------------------- transform

def _ntt_rec(x: jnp.ndarray, log_n: int, inverse: bool, tw_dom, mats,
             top_log: int) -> jnp.ndarray:
    """(16, M, n) natural order -> (16, M, n) natural order (no 1/n).

    tw_dom: (16, n_top) direction-matched domain power table (jit arg);
    mats: (stage, leaf) Toeplitz device matrices (jit args)."""
    if log_n <= MAX_LEAF_LOG:
        return _dft_apply(x, mats[1], 1 << log_n, 1 << log_n)
    log_n1 = LOG_R
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    nlimb, m, _ = x.shape

    # columns over i1 (x[i1*n2 + i2]): bring i1 last
    t = x.reshape(nlimb, m, n1, n2)
    t = jnp.swapaxes(t, -1, -2)                    # (16, M, n2, n1)
    t = _dft_apply(t.reshape(nlimb, m * n2, n1), mats[0], n1, n1)
    t = t.reshape(nlimb, m, n2, n1)                # [i2][k1]

    # inter-step twiddles w_n^(k1*i2), gathered in-graph from the
    # top-level domain table (see _step_twiddle_exp)
    exp = _step_twiddle_exp(top_log, log_n)        # (n1, n2)
    tw = jnp.take(tw_dom, exp.reshape(-1), axis=1).reshape(
        nlimb, n1, n2
    )
    t = lb.mont_mul(t, jnp.swapaxes(tw, -1, -2)[:, None], FR_SPEC)

    # rows over i2 for each k1: bring i2 last
    t = jnp.swapaxes(t, -1, -2)                    # (16, M, n1, n2)
    t = _ntt_rec(t.reshape(nlimb, m * n1, n2), log_n2, inverse,
                 tw_dom, mats, top_log)
    t = t.reshape(nlimb, m, n1, n2)                # [k1][k2]

    # natural order: X[k1 + n1*k2] -> k2-major flat
    t = jnp.swapaxes(t, -1, -2)                    # (16, M, n2, n1)
    return t.reshape(nlimb, m, n1 * n2)


@partial(jax.jit, static_argnames=("log_n", "inverse"))
def _ntt_mxu_jit(x: jnp.ndarray, tw_dom, n_inv_mont, mats, log_n: int,
                 inverse: bool) -> jnp.ndarray:
    out = _ntt_rec(x, log_n, inverse, tw_dom, mats, log_n)
    if inverse:
        out = lb.mont_mul(out, n_inv_mont[:, :, :1], FR_SPEC)
    return out


def ntt_mxu(x: jnp.ndarray, log_n: int, inverse: bool = False) -> jnp.ndarray:
    """Natural-order NTT/INTT of (16, B, n) Montgomery limbs on the MXU.

    Drop-in for ops.ntt.ntt_natural at large n (the per-sub-DFT work
    rides the MXU as exact int8 matmuls). Inverse applies the 1/n scale.
    """
    assert x.shape[-1] == 1 << log_n
    _ensure_constants(log_n, inverse)  # eager: caches must not hold tracers
    dom = ntt_ops.get_domain(log_n)
    tw = dom.tw_inv if inverse else dom.tw_fwd
    return _ntt_mxu_jit(
        x, tw, dom.n_inv_mont, mxu_mats(log_n, inverse), log_n, inverse
    )
