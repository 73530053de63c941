"""Native (C++) zkey ingest vs the numpy reference path."""

import numpy as np
import pytest

from icicle_snark_tpu.io import native
from icicle_snark_tpu.io.zkey import ZKeyFile
from icicle_snark_tpu.setup.r1cs import complex_circuit
from icicle_snark_tpu.setup.trusted_setup import groth16_setup


def test_native_decode_matches_numpy(tmp_path):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    r1cs = complex_circuit(12, 17)
    zkey = str(tmp_path / "c.zkey")
    groth16_setup(r1cs, zkey)

    zk = ZKeyFile(zkey)
    n = zk.header.domain_size
    m, c, s, coef = zk.coefficients()
    slot = m.astype(np.int64) * n + c.astype(np.int64)
    order = np.argsort(slot, kind="stable")

    got = native.decode_plan(zkey, zk.header.n8r, n)
    assert got is not None
    s_sorted, slot_sorted, coef_sorted = got
    assert np.array_equal(slot_sorted, slot[order])
    assert np.array_equal(s_sorted, s[order])
    assert np.array_equal(coef_sorted, coef[order])
