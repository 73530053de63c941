"""Library API: prove / verify / cache management.

The analog of the reference's lib.rs surface
(/root/reference/src/lib.rs:219-268): `groth16_prove` writes
snarkjs-format proof.json/public.json, `groth16_verify` runs the
4-pairing check, and a `CacheManager` keeps parsed proving keys
device-resident across calls. Device selection collapses to JAX's
platform choice — there is no dlopen backend zoo to manage; the "CPU
backend" is the same code on the JAX CPU platform.
"""

from __future__ import annotations

import json
import time

from ..refmath import groth16 as refproto
from .cache import CacheManager, ZKeyCache, load_zkey_cache
from . import pipeline

__all__ = ["CacheManager", "ZKeyCache", "groth16_prove", "groth16_verify"]


def groth16_prove(
    witness_path: str,
    zkey_path: str,
    proof_path: str,
    public_path: str,
    cache_manager: CacheManager | None = None,
    deterministic: bool = False,
) -> float:
    """Prove and write snarkjs-format outputs; returns elapsed seconds
    (the reference prints `proof took:`, src/lib.rs:227-244)."""
    cache_manager = cache_manager or CacheManager()
    cache = cache_manager.get(zkey_path)

    start = time.perf_counter()
    proof, public = pipeline.prove(witness_path, cache, deterministic=deterministic)
    elapsed = time.perf_counter() - start

    with open(proof_path, "w") as fh:
        json.dump(proof, fh, indent=1)
    with open(public_path, "w") as fh:
        json.dump(public, fh, indent=1)
    return elapsed


def groth16_verify(proof_path: str, public_path: str, vk_path: str) -> bool:
    """Host-side verification (the reference's pairing is host-side
    too, /root/reference/icicle/src/pairing.cpp:168-182)."""
    return refproto.verify_files(proof_path, public_path, vk_path)
