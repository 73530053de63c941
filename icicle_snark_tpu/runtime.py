"""Device/runtime policy layer.

The TPU-native counterpart of the reference's runtime C-API + DeviceAPI
registry (/root/reference/icicle/src/runtime.cpp:15-386,
device_api.cpp:129-245). The roles map onto JAX natives:

  reference                         here
  --------------------------------  --------------------------------
  dlopen'd backend .so registry     jax platform/plugin registry
  icicle_set_device (thread-local)  set_device(): jax.config platform
  icicle_malloc / copy / memset     jax.device_put / numpy round-trips
  IcicleStream + async ops          XLA async dispatch; sync() barrier
  icicle_get_device_properties      device_properties()
  warmup                            warmup(): tiny jit round-trip

There is deliberately no VTable indirection: the "CPU backend" is the
same traced code on the CPU platform (it doubles as the differential
reference, mirroring how the reference uses its CPU backend as the
test oracle — SURVEY.md section 4).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from .errors import DeviceError

_DEVICE_ALIASES = {"CPU": "cpu", "CUDA": "tpu", "TPU": "tpu", "AXON": "tpu"}


def available_devices() -> list:
    return sorted({d.platform for d in jax.devices()})


def set_device(device_type: str, num_cpu_devices: int | None = None):
    """Select the compute platform (reference: icicle_set_device).

    Accepts the reference's spellings ("CPU"/"CUDA") so callers of the
    CLI protocol keep working; "CUDA" maps to the accelerator platform.
    """
    want = _DEVICE_ALIASES.get(device_type.upper(), device_type.lower())
    devs = _safe_devices()
    if devs and want in {d.platform for d in devs}:
        return  # already selected
    if want == "tpu":
        # the accelerator platform may be registered as tpu or a plugin
        # name; pick whatever non-cpu platform is present
        plats = {d.platform for d in jax.devices()} if _safe_devices() else set()
        if plats - {"cpu"}:
            return  # already on an accelerator
        raise DeviceError(f"no accelerator platform available (have {plats})")
    try:
        jax.config.update("jax_platforms", "cpu")
        if num_cpu_devices:
            jax.config.update("jax_num_cpu_devices", num_cpu_devices)
    except RuntimeError as exc:  # backends already initialized
        raise DeviceError(f"cannot switch device after first use: {exc}") from exc


def _safe_devices():
    try:
        return jax.devices()
    except Exception:
        return []


def get_device() -> str:
    return jax.devices()[0].platform


@dataclass
class DeviceProperties:
    """Reference: icicle_get_device_properties (DeviceProperties)."""

    using_host_memory: bool
    num_memory_regions: int
    supports_pinned_memory: bool


def device_properties() -> DeviceProperties:
    d = jax.devices()[0]
    host = d.platform == "cpu"
    return DeviceProperties(
        using_host_memory=host, num_memory_regions=1, supports_pinned_memory=not host
    )


def warmup():
    """Touch the device once so later timings exclude dispatch setup
    (reference: warmup(stream), icicle-runtime/src/lib.rs:179-186)."""
    x = jax.numpy.zeros((8, 128), jax.numpy.uint32)
    np.asarray(x + 1)


def sync():
    """Block until all enqueued device work is complete (the analog of
    stream.synchronize; note jax arrays also expose block_until_ready,
    which some transports do not honor — a numpy round-trip is the
    reliable barrier)."""
    x = jax.numpy.zeros((1,), jax.numpy.uint32)
    np.asarray(x)
