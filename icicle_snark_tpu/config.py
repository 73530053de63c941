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
    """Reference: kNN/kNR/kRN/kRR/kNM/kMN (ntt/mod.rs:26-67). The prove
    pipeline uses NR/RN internally (reorder-free bitrev pairing).

    kNM/kMN are the reference's mixed-radix digit-reversed orderings;
    for a radix-2 transform the digit reversal IS the bit reversal, so
    NM == NR and MN == RN here — the round-trip contract (NM forward
    then MN inverse restores natural order, the reference's coset-
    interpolation pattern, ntt/tests.rs:38-365) holds identically."""

    NN = 0
    NR = 1
    RN = 2
    RR = 3
    NM = 4
    MN = 5


@dataclass
class MSMConfig:
    """Reference: MSMConfig (msm/mod.rs:13-73). `c=0` = auto heuristic;
    `signed` digits halve the bucket space; `chunk` is the prefix-scan
    chunk length (sequential steps per level); `precompute_factor`
    consumes bases produced by ops.msm.precompute_bases with the same
    factor (reference: precompute_factor + msm_precompute_bases)."""

    c: int = 0
    chunk: int = 32
    signed: bool = True
    precompute_factor: int = 1
    batch_size: int = 1
    are_points_shared_in_batch: bool = True
    ext: dict = field(default_factory=dict)


@dataclass
class NTTConfig:
    """Reference: NTTConfig (ntt/mod.rs:73-107). `coset_gen` is an
    arbitrary coset generator as a field INTEGER (standard form);
    `columns_batch=True` means the batch lives in the LAST axis
    (16, n, batch) — column-major like the reference's columns_batch."""

    batch_size: int = 1
    ordering: Ordering = Ordering.NN
    coset_gen: int | None = None  # arbitrary generator; None = no coset
    columns_batch: bool = False
    ext: dict = field(default_factory=dict)


@dataclass
class VecOpsConfig:
    """Reference: VecOpsConfig (vec_ops/mod.rs:6-32). Retained for API
    parity; all knobs are implicit in XLA fusion."""

    batch_size: int = 1
    ext: dict = field(default_factory=dict)
