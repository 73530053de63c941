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

Opt-in via ISTPU_SERVE_LEAN=1 (read lazily at first call so tests can
set it per-process): inactive, a wrapper IS just jax.jit(fn) — same
cache, zero behavior change. The earlier AOT prewarm attempt was
reverted because `jit.lower().compile()` + a later ordinary jit call
pays the compile twice (different caches, ROADMAP); here the swap
CALLS the background-compiled jit twin itself, so nothing compiles
twice.
"""

from __future__ import annotations

import os
import sys
import threading
from concurrent.futures import ThreadPoolExecutor

import jax

from .fields import limbs as lb

# One small pool shared by every wrapper: at most 2 concurrent
# background compiles, so the swap machinery never floods the shared
# remote compile-service queue (killed/parallel jobs degrade it for
# everyone — ROADMAP wedge incident).
_POOL: ThreadPoolExecutor | None = None
_POOL_LOCK = threading.Lock()


def _pool() -> ThreadPoolExecutor:
    global _POOL
    with _POOL_LOCK:
        if _POOL is None:
            _POOL = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="istpu-unroll-compile"
            )
        return _POOL


def _active() -> bool:
    return os.environ.get("ISTPU_SERVE_LEAN", "0") == "1"


class DualModeJit:
    """Callable wrapping two jit instances of one function.

    `_full` is the ordinary jax.jit (ambient arithmetic mode — the
    unrolled default on TPU). `_lean` is a second jit instance whose
    traces run under lb.unroll_mode(1, 1). Serving picks per arg-shape
    key: lean until the background `_full` compile for that key lands.

    Only __call__ switches; .lower/.__wrapped__ delegate to `_full`
    (tools/tpu_compile_probe.py uses .lower on the production jit).
    """

    def __init__(self, fn, **jit_kwargs):
        self._fn = fn
        self._full = jax.jit(fn, **jit_kwargs)
        self._lean = jax.jit(fn, **jit_kwargs)
        self._ready: set = set()        # arg-shape keys served by _full
        self._inflight: set = set()     # keys with a background compile
        self._lean_done: set = set()    # keys whose lean trace completed
        self._state_lock = threading.Lock()
        self.__wrapped__ = fn
        self.__name__ = getattr(fn, "__name__", "dual_mode_jit")
        self.__doc__ = fn.__doc__

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
        (measured, ROADMAP) so the twin is called, not AOT'd."""
        try:
            # unroll_mode() with no overrides: serializes this trace
            # against concurrent lean traces on the shared mode globals.
            with lb.unroll_mode():
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
            with self._state_lock:
                self._inflight.discard(key)

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
            lean_traced = key in self._lean_done
        if use_full:
            return self._full(*args, **kwargs)
        if spawn:
            _pool().submit(self._compile_full, key, args, kwargs)
        if lean_traced:
            # jit cache hit — no trace will occur, so don't take the
            # mode lock (a background unrolled TRACE can hold it for
            # tens of seconds; warm serving must not block on it).
            return self._lean(*args, **kwargs)
        with lb.unroll_mode(1, 1):
            out = self._lean(*args, **kwargs)
        with self._state_lock:
            self._lean_done.add(key)
        return out


def dual_mode_jit(fn=None, **jit_kwargs):
    """Drop-in for jax.jit on the big prove modules (decorator or
    direct call; jit kwargs like static_argnums/static_argnames pass
    through)."""
    if fn is None:
        return lambda f: DualModeJit(f, **jit_kwargs)
    return DualModeJit(fn, **jit_kwargs)
