"""Two-process multi-host rehearsal on one machine (DCN-path check).

Spawns 2 JAX processes x 4 virtual CPU devices each (an 8-way `data`
mesh spanning processes), runs the full sharded prove on the committed
tiny fixture through the REAL multi-process ingest path
(mesh.globalize -> jax.make_array_from_process_local_data), and checks
both processes produce the single-chip-bit-exact deterministic proof.

This is the code path a real >=2-host TPU slice runs; the one thing it
cannot exercise here is ICI/DCN itself (collectives ride the in-process
CPU transport).

Usage:  python tools/multiproc_dryrun.py            # parent: spawn + check
        (child mode is internal, selected via ISTPU_MP_CHILD)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = int(os.environ.get("ISTPU_MP_PORT", "48763"))
NPROC = 2
LOCAL_DEVICES = 4


def child(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jaxlib: default implementation
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC,
        process_id=pid,
    )
    assert jax.process_count() == NPROC
    assert len(jax.devices()) == NPROC * LOCAL_DEVICES

    import __graft_entry__ as ge
    from icicle_snark_tpu.parallel.mesh import make_mesh
    from icicle_snark_tpu.parallel.prove_step import prove_multichip

    cache, wtns = ge._tiny_fixture()
    mesh = make_mesh()  # global, hosts-major
    proof, public = prove_multichip(mesh, wtns, cache, deterministic=True)
    out = os.path.join(REPO, ".fixtures", f"mp_proof_{pid}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump({"proof": proof, "public": public}, fh)
    print(f"[child {pid}] proof written", flush=True)


def main() -> int:
    if "ISTPU_MP_CHILD" in os.environ:
        child(int(os.environ["ISTPU_MP_CHILD"]))
        return 0

    env_base = dict(os.environ)
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["ISTPU_CARRY_UNROLL"] = "1"
    env_base["ISTPU_MONT_UNROLL"] = "1"
    # --xla_cpu_max_isa pins codegen to a baseline ISA: .jax_cache_mp is
    # COMMITTED, so its executables must run on hosts other than the one
    # that built them (feature-mismatched entries SIGILL — conftest note)
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
        " --xla_backend_optimization_level=0"
        " --xla_llvm_disable_expensive_passes=true"
        " --xla_cpu_max_isa=AVX2"
    )
    env_base["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache_mp")
    env_base["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env_base["PYTHONUNBUFFERED"] = "1"

    procs = []
    for pid in range(NPROC):
        env = dict(env_base)
        env["ISTPU_MP_CHILD"] = str(pid)
        procs.append(subprocess.Popen([sys.executable, "-u", __file__], env=env))
    rc = 0
    deadline = time.time() + float(os.environ.get("ISTPU_MP_TIMEOUT", "1500"))
    for p in procs:
        p.wait(timeout=max(deadline - time.time(), 1))
        rc |= p.returncode
    if rc:
        print(f"FAIL: child rc={rc}")
        return rc

    # compare both proofs with each other and with the single-chip one
    proofs = []
    for pid in range(NPROC):
        with open(os.path.join(REPO, ".fixtures", f"mp_proof_{pid}.json")) as fh:
            proofs.append(json.load(fh))
    if proofs[0] != proofs[1]:
        print("FAIL: processes disagree")
        return 1

    import jax

    jax.config.update("jax_platforms", "cpu")
    import __graft_entry__ as ge
    from icicle_snark_tpu.prover import pipeline

    cache, wtns = ge._tiny_fixture()
    ref_proof, ref_public = pipeline.prove(wtns, cache, deterministic=True)
    ok = proofs[0]["proof"] == ref_proof and proofs[0]["public"] == ref_public
    print("OK: 2-process x 4-device proof bit-exact vs single-chip" if ok
          else "FAIL: multi-process proof != single-chip proof")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
