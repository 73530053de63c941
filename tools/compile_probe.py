"""Measure XLA:CPU cold-compile time of the dryrun's three step modules
(tiny shapes, D=8 mesh) — the driver-gate budget. Run:

  python tools/compile_probe.py [--steps a,b,c]

Uses a throwaway compile-cache dir so numbers are really cold.
"""

import os
import sys
import tempfile
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    " --xla_backend_optimization_level=0"
    " --xla_llvm_disable_expensive_passes=true"
).strip()
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(prefix="coldcache_")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t(label, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"{label}: {time.time() - t0:.1f}s", flush=True)
    return out


def main():
    steps = "a,b,c"
    for i, a in enumerate(sys.argv):
        if a == "--steps":
            steps = sys.argv[i + 1]
    steps = steps.split(",")

    from icicle_snark_tpu.parallel.mesh import make_mesh
    from icicle_snark_tpu.parallel import prove_step as ps
    from icicle_snark_tpu.ops import ntt as ntt_ops
    from icicle_snark_tpu.fields.limbs import NLIMB

    mesh = make_mesh(jax.devices()[:8])
    log_n = 6
    n = 1 << log_n
    d = 8
    nseg = 2 * n + 1
    n_rec = 4 * n  # records
    dom = ntt_ops.get_domain(log_n)

    if "a" in steps:
        step_a = ps.build_r1cs_coset_step(mesh, log_n, nseg, 0)
        wit = jnp.zeros((NLIMB, n), jnp.uint32)
        coefs = jnp.zeros((NLIMB, n_rec), jnp.uint32)
        wit_idx = jnp.zeros((n_rec,), jnp.int32)
        segs = jnp.zeros((n_rec,), jnp.int32)
        seg2 = jnp.zeros((1,), jnp.int32)
        keys = jnp.zeros((NLIMB, n), jnp.uint32)
        t("step_a (r1cs+dist-NTT) compile+run", lambda: step_a(
            wit, coefs, wit_idx, segs, seg2, keys,
            dom.tw_fwd, dom.tw_inv, dom.n_inv_mont))

    c, k = 8, 8
    if "b" in steps:
        step_b = ps.build_msm_g1_step(mesh, c, k, 1 << 20)
        wit = jnp.zeros((NLIMB, n), jnp.uint32)
        wit_c = jnp.zeros((NLIMB, n - 8), jnp.uint32)
        h = jnp.zeros((NLIMB, n), jnp.uint32)
        g1 = lambda m: tuple(jnp.zeros((NLIMB, m), jnp.uint32) for _ in range(2))
        t("step_b (4-group G1 MSM) compile+run", lambda: step_b(
            wit, wit_c, h, g1(n), g1(n), g1(n - 8), g1(n)))

    if "c" in steps:
        step_c = ps.build_msm_g2_step(mesh, c, k, 1 << 19)
        wit = jnp.zeros((NLIMB, n), jnp.uint32)
        g2p = tuple(jnp.zeros((NLIMB, 2, n), jnp.uint32) for _ in range(2))
        t("step_c (G2 MSM) compile+run", lambda: step_c(wit, g2p))


if __name__ == "__main__":
    main()
