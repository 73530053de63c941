"""Multi-PROCESS (DCN-path) parity: 2 jax.distributed processes x 4
virtual CPU devices run the sharded prove through the real multi-host
ingest (mesh.globalize -> jax.make_array_from_process_local_data) and
must produce the single-chip-bit-exact deterministic proof.

Wraps tools/multiproc_dryrun.py (the only way to exercise
jax.distributed on this image — the coordinator requires separate
processes, not virtual devices). ~2-4 min on one core; default tier,
not `fast`.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_prove_bitexact():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["ISTPU_MP_PORT"] = "48771"  # avoid collisions with manual runs
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(_REPO, "tools", "multiproc_dryrun.py")],
        env=env, cwd=_REPO, capture_output=True, text=True, timeout=1500,
    )
    tail = (proc.stdout + proc.stderr)[-2000:]
    assert proc.returncode == 0, f"multiproc dryrun failed:\n{tail}"
    assert "bit-exact vs single-chip" in proc.stdout, tail
