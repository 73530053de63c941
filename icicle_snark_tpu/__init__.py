"""icicle-snark-tpu: a TPU-native Groth16 zk-SNARK prover/verifier (BN254).

A from-scratch JAX/XLA/Pallas framework with the capabilities of
ingonyama-zk/icicle-snark: consumes snarkjs `.zkey` proving keys and
`.wtns` witness files, emits snarkjs-format `proof.json`/`public.json`,
and verifies proofs against snarkjs `verification_key.json`.

Public API (mirrors the reference's `src/lib.rs:219-268`):

    groth16_prove(witness, zkey, proof, public, device, cache_manager)
    groth16_verify(proof, public, vk)
    CacheManager
"""

__version__ = "0.1.0"

from .prover.api import groth16_prove, groth16_verify, CacheManager  # noqa: F401
