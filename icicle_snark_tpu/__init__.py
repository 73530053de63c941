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

import os as _os

# Persistent XLA compilation cache: the limb-arithmetic graphs are large
# and the remote-TPU (axon) compiler round-trip is slow; caching compiled
# executables across processes mirrors the warm-cache serving posture of
# the reference's ZKeyCache (README.md:113).
#
# The env var alone is NOT enough in this image: sitecustomize imports
# jax at interpreter startup (before any of our code runs), and jax
# snapshots the env into its config at import. Set the config
# explicitly — it takes effect lazily at first compile.
_CACHE_DIR = _os.environ.get("JAX_COMPILATION_CACHE_DIR") or _os.path.abspath(
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "..", ".jax_cache")
)
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .prover.api import groth16_prove, groth16_verify, CacheManager  # noqa: F401
