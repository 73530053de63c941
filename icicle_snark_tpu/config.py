"""Per-op configuration structs.

API-shape parity with the reference's #[repr(C)] config structs +
ConfigExtension knob map (/root/reference/wrappers/rust/icicle-core/src/
{msm,ntt,vec_ops}/mod.rs, icicle/src/config_extension.cpp). Fields that
only make sense for CUDA streams/explicit device flags collapse into
documentation: arrays are device-resident jax arrays and async-ness is
XLA's dispatch model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class NTTDir(Enum):
    FORWARD = 0
    INVERSE = 1


class Ordering(Enum):
    """Reference: kNN/kNR/kRN/kRR (ntt/mod.rs:26-47). The prove
    pipeline uses NR/RN internally (reorder-free bitrev pairing)."""

    NN = 0
    NR = 1
    RN = 2
    RR = 3


@dataclass
class MSMConfig:
    """Reference: MSMConfig (msm/mod.rs:13-73). `c=0` = auto heuristic;
    `signed` digits halve the bucket space; `chunk` is the prefix-scan
    chunk length (sequential steps per level)."""

    c: int = 0
    chunk: int = 32
    signed: bool = True
    batch_size: int = 1
    are_points_shared_in_batch: bool = True
    ext: dict = field(default_factory=dict)


@dataclass
class NTTConfig:
    """Reference: NTTConfig (ntt/mod.rs:73-107)."""

    batch_size: int = 1
    ordering: Ordering = Ordering.NN
    coset_gen: int | None = None  # key-powers path; None = no coset
    ext: dict = field(default_factory=dict)


@dataclass
class VecOpsConfig:
    """Reference: VecOpsConfig (vec_ops/mod.rs:6-32). Retained for API
    parity; all knobs are implicit in XLA fusion."""

    batch_size: int = 1
    ext: dict = field(default_factory=dict)
