"""Serve-lean-first jit: fast cold start without the warm-speed tax.

The first prove of a session pays the XLA compile of three big modules
(R1CS+coset-NTT, grouped G1 MSM, G2 MSM). Two arithmetic formulations
exist in fields/limbs.py, identical in results but not in compile time
(ROADMAP "First-prove compile" table, measured per module on the chip):

  unrolled (default): ripple carry/CIOS as Python loops — fastest warm
      (pmadd 60.7 ns/lane) but ~374 s total cold compile at 100k shapes
  lean (unroll=1):    each chain a ~5-op lax.scan body — ~3x smaller
      HLO, ~162 s cold compile, ~11% slower warm (pmadd 67.2 ns/lane)

`dual_mode_jit` gets the best of both within one process: the FIRST
call for a given arg-shape traces+compiles+serves the LEAN variant
(user waits ~2.3x less), and a background thread compiles the unrolled
twin; once that lands, subsequent calls with the same shapes use it.
The reference has no analog (CUDA kernels are precompiled; its cold
cost is cache build, cache.rs:120-170) — this is TPU-specific
machinery for XLA's compile-at-first-use model.

Twin identity (the round-4 bug): under jax 0.9.0, two `jax.jit(fn)`
wrappers over the SAME function object share one trace/lowering cache,
so a mode flipped only around the call site is invisible to the second
wrapper — both twins compile whichever graph traced first (verified:
identical StableHLO from both wrappers; VERDICT r4 Weak #1). The twins
here are therefore DISTINCT closure functions that enter
`lb.unroll_mode(...)` INSIDE the traced body, so (a) each jit owns its
own cache, and (b) the mode is bound at trace time by function
identity, not by ambient mutable state. The mode itself is thread-local
(fields/limbs.py), so a background unrolled trace never blocks or
pollutes a foreground lean trace (ADVICE r4 findings 1-2).

Opt-in via ISTPU_SERVE_LEAN=1 (read lazily at first call so tests can
set it per-process): inactive, a wrapper IS just jax.jit of the
unrolled twin — zero behavior change. The earlier AOT prewarm attempt
was reverted because `jit.lower().compile()` + a later ordinary jit
call pays the compile twice (different caches, ROADMAP); here the swap
CALLS the background-compiled jit twin itself, so nothing compiles
twice.
"""

from __future__ import annotations

import functools
import os
import sys
import threading

import jax

from .fields import limbs as lb

# At most 2 concurrent background compiles, so the swap machinery never
# floods the shared remote compile-service queue (killed/parallel jobs
# degrade it for everyone — ROADMAP wedge incident). DAEMON threads
# gated by a semaphore, not a ThreadPoolExecutor: the executor's
# interpreter-exit join would hang a finishing CLI worker on held or
# in-flight compiles the user no longer wants.
_SLOTS = threading.Semaphore(2)

# Every DualModeJit instance, so callers (bench.py) can wait for all
# in-flight background unrolled compiles before timing warm reps.
_INSTANCES: list = []

# Background compiles are HELD until the foreground cold path is done:
# the remote compile service schedules concurrent requests against each
# other, so unrolled twins compiling DURING the lean-served first prove
# slow the exact compiles the user is waiting on (measured: the
# first-prove window stretched from ~3 min lean-only toward the ~9 min
# lean+unrolled total). cli.py/bench.py call release_background() when
# the first prove returns; the fallback timer below releases anyway if
# no one does (library users without the hook).
_RELEASE = threading.Event()
_RELEASE_FALLBACK_S = float(os.environ.get("ISTPU_SERVE_LEAN_HOLD", "900"))
_FALLBACK_TIMER: threading.Timer | None = None


def release_background() -> None:
    """Let held background unrolled compiles start (idempotent)."""
    _RELEASE.set()


def _reset_release_for_tests() -> None:
    """Re-arm the hold (tests only — the release event is process-global)."""
    global _FALLBACK_TIMER
    if _FALLBACK_TIMER is not None:
        _FALLBACK_TIMER.cancel()
        _FALLBACK_TIMER = None
    _RELEASE.clear()


def _arm_fallback() -> None:
    global _FALLBACK_TIMER
    if _RELEASE.is_set() or _FALLBACK_TIMER is not None:
        return
    _FALLBACK_TIMER = threading.Timer(_RELEASE_FALLBACK_S, _RELEASE.set)
    _FALLBACK_TIMER.daemon = True
    _FALLBACK_TIMER.start()


def _spawn(fn, *args) -> None:
    t = threading.Thread(
        target=fn, args=args, daemon=True, name="istpu-unroll-compile"
    )
    t.start()


def _active() -> bool:
    return os.environ.get("ISTPU_SERVE_LEAN", "0") == "1"


class DualModeJit:
    """Callable wrapping two jit instances of one function.

    `_full` jits an unrolled-mode closure twin (the ambient default
    factors, captured at construction). `_lean` jits a distinct
    unroll=(1,1) closure twin. Serving picks per arg-shape key: lean
    until the background `_full` compile for that key lands.

    Only __call__ switches; .lower/.__wrapped__ delegate to `_full`
    (tools/tpu_compile_probe.py uses .lower on the production jit).
    """

    def __init__(self, fn, **jit_kwargs):
        self._fn = fn
        # the "full" mode is whatever the environment default is at
        # construction (== import time for decorated module functions);
        # pinning it here keeps the full twin's graph independent of
        # any unroll_mode scope a caller happens to be inside.
        full_mode = (lb.carry_unroll(), lb.mont_unroll())

        # functools.wraps sets __wrapped__, which inspect.signature
        # follows — so static_argnames/static_argnums resolve against
        # fn's real signature despite the *args/**kwargs shims.
        @functools.wraps(fn)
        def _full_twin(*args, **kwargs):
            with lb.unroll_mode(*full_mode):
                return fn(*args, **kwargs)

        @functools.wraps(fn)
        def _lean_twin(*args, **kwargs):
            with lb.unroll_mode(1, 1):
                return fn(*args, **kwargs)

        _lean_twin.__name__ = getattr(fn, "__name__", "fn") + "_lean"

        self._full = jax.jit(_full_twin, **jit_kwargs)
        self._lean = jax.jit(_lean_twin, **jit_kwargs)
        self._ready: set = set()        # arg-shape keys served by _full
        self._inflight: set = set()     # keys with a background compile
        self._lean_done: set = set()    # keys whose lean trace completed
        self._state_lock = threading.Lock()
        self.__wrapped__ = fn
        self.__name__ = getattr(fn, "__name__", "dual_mode_jit")
        self.__doc__ = fn.__doc__
        _INSTANCES.append(self)

    # --- jax.jit surface used elsewhere in the repo -------------------
    def lower(self, *args, **kwargs):
        return self._full.lower(*args, **kwargs)

    # ------------------------------------------------------------------
    @staticmethod
    def _key(args, kwargs):
        """Hashable shape/dtype signature: static (non-array) args ride
        by value — they select different graphs, exactly like jit's own
        cache key."""

        def leaf(x):
            shape = getattr(x, "shape", None)
            if shape is None:
                return x
            return (tuple(shape), str(getattr(x, "dtype", "")))

        return repr(jax.tree_util.tree_map(leaf, (args, tuple(sorted(kwargs.items())))))

    def _compile_full(self, key, args, kwargs):
        """Background: trace+compile+run the unrolled twin once, then
        mark `key` ready. The one discarded execution (~1 s at prove
        shapes) keeps this on jit's own dispatch cache — an AOT
        .compile() here would NOT be reused by later ordinary calls
        (measured, ROADMAP) so the twin is called, not AOT'd.

        Held on _RELEASE first: compiling the unrolled twin WHILE the
        foreground still waits on lean compiles contends at the shared
        compile service (module docstring). _SLOTS caps service
        concurrency at 2."""
        _RELEASE.wait()
        _SLOTS.acquire()
        try:
            out = self._full(*args, **kwargs)
            jax.block_until_ready(out)
            with self._state_lock:
                self._ready.add(key)
        except Exception as exc:  # never break serving from the background
            print(
                f"[serve-lean] background unrolled compile failed for "
                f"{self.__name__}: {type(exc).__name__}: {exc}",
                file=sys.stderr, flush=True,
            )
        finally:
            _SLOTS.release()
            with self._state_lock:
                self._inflight.discard(key)

    def pending(self) -> int:
        """Number of background unrolled compiles still in flight."""
        with self._state_lock:
            return len(self._inflight)

    def __call__(self, *args, **kwargs):
        if not _active():
            return self._full(*args, **kwargs)
        if any(
            isinstance(x, jax.core.Tracer)
            for x in jax.tree_util.tree_leaves((args, kwargs))
        ):
            # called under an outer trace (e.g. the driver jits
            # entry()'s fn): no mode games, and never hand tracers to a
            # background thread — the outer jit's cache owns this call.
            return self._full(*args, **kwargs)
        key = self._key(args, kwargs)
        with self._state_lock:
            use_full = key in self._ready
            spawn = not use_full and key not in self._inflight
            if spawn:
                self._inflight.add(key)
        if use_full:
            return self._full(*args, **kwargs)
        if spawn:
            _arm_fallback()
            _spawn(self._compile_full, key, args, kwargs)
        out = self._lean(*args, **kwargs)
        with self._state_lock:
            self._lean_done.add(key)
        return out


def wait_all_ready(timeout: float = 900.0, log=None) -> bool:
    """Block until every background unrolled compile has landed (or
    timeout). bench.py calls this between the first (lean-served) prove
    and the timed warm reps so the headline number measures the
    unrolled graphs, not the lean ones. Releases held background
    compiles first (waiting on a held job would deadlock until the
    fallback timer). Returns True if drained."""
    import time

    release_background()
    t0 = time.time()
    while time.time() - t0 < timeout:
        n = sum(w.pending() for w in _INSTANCES)
        if n == 0:
            return True
        if log is not None and int(time.time() - t0) % 30 == 0:
            log(f"[serve-lean] waiting on {n} background unrolled compiles "
                f"({time.time() - t0:.0f}s)")
        time.sleep(1.0)
    return False


def dual_mode_jit(fn=None, **jit_kwargs):
    """Drop-in for jax.jit on the big prove modules (decorator or
    direct call; jit kwargs like static_argnums/static_argnames pass
    through)."""
    if fn is None:
        return lambda f: DualModeJit(f, **jit_kwargs)
    return DualModeJit(fn, **jit_kwargs)
