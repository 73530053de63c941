"""serve_lean.DualModeJit: lean-first serving with background unrolled swap.

Covers the round-5-queued VERDICT item (first-prove compile): the big
prove modules serve a compile-lean twin on first use and hot-swap to
the unrolled twin once its background compile lands — within ONE
process, which the reverted AOT-prewarm approach could not do
(ROADMAP: lower().compile() + later jit call pays the compile twice).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icicle_snark_tpu import serve_lean
from icicle_snark_tpu.fields import limbs as lb

pytestmark = pytest.mark.fast


def _toy_fn(a, b):
    return lb.mont_mul(a, b, lb.FR_SPEC)


def _rand_limbs(rng, n):
    from icicle_snark_tpu.refmath.field import R_MOD

    vals = [rng.randrange(R_MOD) for _ in range(n)]
    return jnp.asarray(lb.ints_to_limbs_np(vals))


def test_inactive_is_plain_jit(monkeypatch):
    monkeypatch.delenv("ISTPU_SERVE_LEAN", raising=False)
    import random

    rng = random.Random(7)
    w = serve_lean.dual_mode_jit(_toy_fn)
    a, b = _rand_limbs(rng, 8), _rand_limbs(rng, 8)
    got = np.asarray(w(a, b))
    want = np.asarray(jax.jit(_toy_fn)(a, b))
    np.testing.assert_array_equal(got, want)
    assert not w._ready and not w._inflight  # machinery untouched


def test_lean_serves_then_swaps(monkeypatch):
    monkeypatch.setenv("ISTPU_SERVE_LEAN", "1")
    import random

    rng = random.Random(8)
    serve_lean._reset_release_for_tests()
    try:
        w = serve_lean.dual_mode_jit(_toy_fn)
        a, b = _rand_limbs(rng, 8), _rand_limbs(rng, 8)

        lean_out = np.asarray(w(a, b))  # first call: lean twin + bg spawn
        key = w._key((a, b), {})
        assert key in w._lean_done

        # the background compile is HELD until release_background():
        # compiling the unrolled twin during the foreground cold path
        # would contend at the shared compile service
        time.sleep(1.0)
        assert key not in w._ready, "background compile ran while held"
        assert w.pending() == 1

        serve_lean.release_background()
        deadline = time.time() + 120
        while key not in w._ready and time.time() < deadline:
            time.sleep(0.1)
        assert key in w._ready, "background unrolled compile never landed"
    finally:
        serve_lean.release_background()

    full_out = np.asarray(w(a, b))  # now served by the unrolled twin
    np.testing.assert_array_equal(lean_out, full_out)
    # correctness vs an ordinary jit of the same function
    np.testing.assert_array_equal(
        full_out, np.asarray(jax.jit(_toy_fn)(a, b))
    )


def test_distinct_shapes_get_distinct_keys(monkeypatch):
    monkeypatch.setenv("ISTPU_SERVE_LEAN", "1")
    import random

    rng = random.Random(9)
    w = serve_lean.dual_mode_jit(_toy_fn)
    a8, b8 = _rand_limbs(rng, 8), _rand_limbs(rng, 8)
    a4, b4 = _rand_limbs(rng, 4), _rand_limbs(rng, 4)
    w(a8, b8)
    w(a4, b4)
    assert w._key((a8, b8), {}) != w._key((a4, b4), {})
    # each shape got its own background compile
    assert len(w._lean_done) == 2


def test_unroll_mode_scopes_and_restores():
    prev = (lb.carry_unroll(), lb.mont_unroll())
    with lb.unroll_mode(1, 1):
        assert (lb.carry_unroll(), lb.mont_unroll()) == (1, 1)
        with lb.unroll_mode(16):  # nested + partial override
            assert (lb.carry_unroll(), lb.mont_unroll()) == (16, 1)
        assert (lb.carry_unroll(), lb.mont_unroll()) == (1, 1)
    assert (lb.carry_unroll(), lb.mont_unroll()) == prev


def test_unroll_mode_is_thread_local():
    """A mode entered in one thread is invisible to another (the
    serve-lean background unrolled trace must not see a foreground
    lean scope, and vice versa — ADVICE r4 findings 1-2)."""
    import threading

    seen = {}
    barrier = threading.Barrier(2)

    def worker():
        barrier.wait()  # main thread is inside unroll_mode(1, 1) now
        seen["other"] = (lb.carry_unroll(), lb.mont_unroll())

    t = threading.Thread(target=worker)
    default = (lb.carry_unroll(), lb.mont_unroll())
    with lb.unroll_mode(1, 1):
        t.start()
        barrier.wait()
        t.join()
    assert seen["other"] == default


def test_twins_have_distinct_trace_caches(monkeypatch):
    """The round-4 regression test, sharpened: the lean and full twins
    must not share a jit trace cache (jax 0.9.0 keys the cache on the
    function object — two jax.jit of ONE fn alias). After the lean
    twin has traced, lowering the full twin must still produce the
    unrolled graph."""
    monkeypatch.setenv("ISTPU_SERVE_LEAN", "1")
    import random

    rng = random.Random(11)
    # construct under an unrolled scope: the full twin pins the
    # AMBIENT mode at construction (on TPU that's the env default
    # 16/16; the test conftest sets lean env defaults, so pin here)
    with lb.unroll_mode(16, 16):
        w = serve_lean.dual_mode_jit(_toy_fn)
    a, b = _rand_limbs(rng, 8), _rand_limbs(rng, 8)
    lean_hlo = w._lean.lower(a, b).as_text()
    full_hlo = w._full.lower(a, b).as_text()
    assert lean_hlo != full_hlo, "twins lowered the identical module"
    # the full twin is the bigger (unrolled) graph
    assert len(full_hlo) > len(lean_hlo)


def test_lean_and_unrolled_graphs_differ_but_agree():
    """unroll_mode(1,1) really changes the traced graph (scan vs ripple)
    and the two graphs compute the same function.

    jax 0.9.0 keys its trace/lowering cache on the function OBJECT —
    tracing ONE function under two modes silently returns the first
    cached graph (the round-4 DualModeJit bug, VERDICT r4 Weak #1). So
    the two modes must be traced through DISTINCT function identities,
    exactly as DualModeJit now constructs its twins."""
    import random

    rng = random.Random(10)
    a, b = _rand_limbs(rng, 8), _rand_limbs(rng, 8)

    def lean_fn(a, b):
        with lb.unroll_mode(1, 1):
            return _toy_fn(a, b)

    def full_fn(a, b):
        with lb.unroll_mode(16, 16):
            return _toy_fn(a, b)

    hlo_lean = jax.jit(lean_fn).lower(a, b).as_text()
    hlo_full = jax.jit(full_fn).lower(a, b).as_text()
    out_lean = np.asarray(jax.jit(lean_fn)(a, b))
    out_full = np.asarray(jax.jit(full_fn)(a, b))
    np.testing.assert_array_equal(out_lean, out_full)
    # the unrolled ripple module is several times the lean scan module
    assert len(hlo_full) > 2 * len(hlo_lean), (
        f"modes traced near-identical graphs "
        f"({len(hlo_lean)} vs {len(hlo_full)} chars)"
    )


def test_prove_pipeline_under_serve_lean(monkeypatch, tmp_path):
    """End-to-end: a tiny prove with ISTPU_SERVE_LEAN=1 produces the
    identical deterministic proof as the default path (the pipeline's
    _construct_r1cs_jit and both MSM jits are DualModeJit-wrapped)."""
    monkeypatch.setenv("ISTPU_SERVE_LEAN", "1")
    from icicle_snark_tpu.io.wtns import write_wtns
    from icicle_snark_tpu.prover import pipeline
    from icicle_snark_tpu.prover.cache import load_zkey_cache
    from icicle_snark_tpu.setup.r1cs import (
        complex_circuit, complex_circuit_witness,
    )
    from icicle_snark_tpu.setup.trusted_setup import groth16_setup

    zkey = str(tmp_path / "c.zkey")
    wtns = str(tmp_path / "w.wtns")
    r1cs = complex_circuit(10, 12)
    groth16_setup(r1cs, zkey)
    write_wtns(wtns, complex_circuit_witness(r1cs, a=5))
    cache = load_zkey_cache(zkey)

    proof_lean, public_lean = pipeline.prove(wtns, cache, deterministic=True)

    monkeypatch.delenv("ISTPU_SERVE_LEAN")
    proof_def, public_def = pipeline.prove(wtns, cache, deterministic=True)
    assert proof_lean == proof_def
    assert public_lean == public_def
