"""Profiling/roofline module: probe entries are well-formed on tiny shapes.

(The real numbers come from `python -m icicle_snark_tpu.profiling` on
the TPU; here we only validate the probes run and the report math.)
"""

import os

import pytest

from icicle_snark_tpu import profiling as prof


def _check_entry(e, kernel_prefix):
    assert e["kernel"].startswith(kernel_prefix)
    assert e["time_s"] > 0
    assert e["throughput"] > 0
    assert e["sol_time_s"] > 0
    assert e["bound"] in ("compute", "memory")


def test_mont_mul_probe():
    _check_entry(prof.profile_mont_mul(256, reps=1, baseline=0.0), "mont_mul")


def test_padd_probe():
    _check_entry(prof.profile_padd(64, reps=1, baseline=0.0), "g1_padd")


def test_ntt_probe():
    _check_entry(prof.profile_ntt(6, reps=1, baseline=0.0), "ntt_2^6")


@pytest.mark.skipif(
    not os.environ.get("ISTPU_HEAVY_TESTS"),
    reason="multi-device MSM sweep compiles the full pipeline per mesh size",
)
def test_scaling_report_multidevice():
    rows = prof.scaling_report(reps=1)
    assert rows and rows[0]["mesh"] == 1


def test_msm_probe_heavy():
    if not os.environ.get("ISTPU_HEAVY_TESTS"):
        pytest.skip("grouped MSM probe is compile-heavy on CPU")
    _check_entry(prof.profile_msm(8, reps=1, baseline=0.0, c=8), "msm_g1")
