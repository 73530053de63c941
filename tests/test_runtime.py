"""Runtime/device-policy and config layer smoke tests."""

import jax

from icicle_snark_tpu import config as cfg
from icicle_snark_tpu import runtime as rt
from icicle_snark_tpu.errors import DeviceError, IcicleSnarkError


def test_device_introspection():
    assert rt.get_device() in ("cpu", "tpu", "axon")
    props = rt.device_properties()
    assert props.num_memory_regions == 1
    assert props.using_host_memory == (rt.get_device() == "cpu")


def test_warmup_and_sync():
    rt.warmup()
    rt.sync()


def test_config_defaults():
    m = cfg.MSMConfig()
    assert m.signed and m.c == 0 and m.chunk == 32  # k=32: measured best (ROADMAP.md)
    n = cfg.NTTConfig()
    assert n.ordering is cfg.Ordering.NN and n.coset_gen is None
    v = cfg.VecOpsConfig()
    assert v.batch_size == 1 and v.ext == {}


def test_error_taxonomy():
    assert issubclass(DeviceError, IcicleSnarkError)
