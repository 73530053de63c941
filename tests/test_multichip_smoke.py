"""Fast-tier D=8 sharded-prove smoke: the exact code path the driver's
`dryrun_multichip` gate exercises (3-phase sharded prove on the
committed tiny fixture), run inline on the virtual 8-device CPU mesh —
a cheap CI proxy so dryrun regressions surface in `pytest -m fast`
instead of only in the driver artifact (VERDICT r2 item 7).

Graph-size knobs mirror __graft_entry__._dryrun_inline: c=5 / k=64 keep
the MSM prefix structures single-level; conftest already forces the
8-device CPU platform and lean XLA flags.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu.fields import limbs as lb
from icicle_snark_tpu.io.wtns import WtnsFile
from icicle_snark_tpu.parallel.mesh import make_mesh
from icicle_snark_tpu.parallel.prove_step import run_sharded_prove

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_shaped_sharded_prove_d8():
    # conftest already selects the lean (scan-carry) limb graphs the
    # dryrun subprocess compiles — limbs.py reads the env at IMPORT,
    # so a fixture would be too late.
    from __graft_entry__ import _tiny_fixture

    cache, wtns_path = _tiny_fixture()
    wtns = WtnsFile(wtns_path)
    witness = jnp.asarray(lb.u32x8_to_limbs(wtns.witness_limbs()))

    mesh = make_mesh(jax.devices()[:8])
    h, ws_g1, ws_b2 = run_sharded_prove(mesh, cache, witness, c=5, c2=5, k=64)
    jax.block_until_ready(ws_b2)
    # structural sanity: replicated window sums, full window counts
    assert np.asarray(ws_g1).shape[2] == 4  # 4 G1 groups
    assert np.asarray(ws_g1).shape[-1] == -(-256 // 5)
    assert np.isfinite(0)  # executed without error is the gate
