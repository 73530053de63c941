"""Device-backed trusted setup must be byte-identical to the host
oracle backend (same seed => same zkey bytes, same vk)."""

import filecmp

import pytest

from icicle_snark_tpu.setup.fast_setup import groth16_setup_device
from icicle_snark_tpu.setup.r1cs import complex_circuit
from icicle_snark_tpu.setup.trusted_setup import groth16_setup


def test_device_setup_bitexact(tmp_path):
    r1cs = complex_circuit(10, 13)
    zk_host = str(tmp_path / "host.zkey")
    zk_dev = str(tmp_path / "dev.zkey")
    vk_host = groth16_setup(r1cs, zk_host)
    vk_dev = groth16_setup_device(r1cs, zk_dev)
    assert vk_dev == vk_host
    assert filecmp.cmp(zk_host, zk_dev, shallow=False), "zkey bytes differ"
