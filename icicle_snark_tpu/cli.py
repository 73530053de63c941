"""Interactive CLI worker: stdin line protocol.

Drop-in replacement for the reference's worker REPL
(/root/reference/src/main.rs:39-186): external drivers spawn one
process, stream commands over stdin, and wait for the
`COMMAND_COMPLETED` sentinel after each — amortizing startup, JIT
compilation, and the device-resident ZKeyCache across proofs (the
reference's python harness does exactly this,
examples/python/main.py:46-66).

Commands:
  prove  --witness W --zkey Z --proof P --public U [--device D]
  verify --proof P --public U --vk V
  exit
"""

from __future__ import annotations

import os
import shlex
import sys

SENTINEL = "COMMAND_COMPLETED"

# persistent JIT cache: a fresh worker process skips recompilation of
# any (shape, pipeline) it has ever proven before
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# Serve the first prove of each shape from the compile-lean arithmetic
# twin (~2.3x faster cold compile) while the unrolled twin compiles in
# the background and takes over warm serving (serve_lean.py). On by
# default for the worker — the REPL protocol exists precisely for cold-
# fair interactive use. ISTPU_SERVE_LEAN=0 restores unrolled-only.
os.environ.setdefault("ISTPU_SERVE_LEAN", "1")


def _parse_flags(tokens: list) -> dict:
    flags = {}
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if not tok.startswith("--"):
            raise ValueError(f"unexpected token: {tok}")
        if i + 1 >= len(tokens):
            raise ValueError(f"missing value for {tok}")
        flags[tok[2:]] = tokens[i + 1]
        i += 2
    return flags


def run_worker(stdin=None, stdout=None, release_after_prove=True):
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout

    from .prover.api import CacheManager, groth16_prove, groth16_verify

    cache_manager = CacheManager()

    def out(line: str):
        print(line, file=stdout, flush=True)

    for raw in stdin:
        line = raw.strip()
        if not line:
            continue
        tokens = shlex.split(line)
        cmd, rest = tokens[0], tokens[1:]
        try:
            if cmd == "exit":
                out(SENTINEL)
                return 0
            elif cmd == "prove":
                f = _parse_flags(rest)
                if "device" in f:
                    # route like the reference (src/main.rs:121-186):
                    # unknown/unavailable devices fail the command loudly
                    from . import runtime

                    runtime.set_device(f["device"])
                elapsed = groth16_prove(
                    f["witness"], f["zkey"], f["proof"], f["public"],
                    cache_manager,
                    deterministic=f.get("deterministic", "0") in ("1", "true"),
                )
                out(f"proof took: {elapsed:.3f}s")  # reference prints the same (lib.rs:244)
                out(SENTINEL)
                if release_after_prove:
                    # foreground cold path done: let held background
                    # unrolled compiles start while the worker idles on
                    # stdin (serve_lean hot-swap; no-op when inactive).
                    # One-shot mode skips this: the process exits right
                    # after, and releasing would orphan the unrolled
                    # compile jobs service-side (queue pollution).
                    from . import serve_lean

                    serve_lean.release_background()
            elif cmd == "export-vk":
                import json

                from .io.zkey import ZKeyFile

                f = _parse_flags(rest)
                vk = ZKeyFile(f["zkey"]).export_verification_key()
                with open(f["vk"], "w") as fh:
                    json.dump(vk, fh, indent=1)
                out(SENTINEL)
            elif cmd == "verify":
                f = _parse_flags(rest)
                ok = groth16_verify(f["proof"], f["public"], f["vk"])
                out("OK!" if ok else "INVALID proof")
                out(SENTINEL)
                if not ok:
                    return 1
            else:
                out(f"ERROR: unknown command {cmd!r}")
                out(SENTINEL)
        except Exception as exc:  # keep the worker alive like the reference REPL
            out(f"ERROR: {exc}")
            out(SENTINEL)
    return 0


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if argv and argv[0] in ("prove", "verify"):
        # one-shot mode: same flags, single command, then exit
        import io

        code = run_worker(
            stdin=io.StringIO(" ".join(shlex.quote(a) for a in argv) + "\nexit\n"),
            release_after_prove=False,
        )
        return code
    return run_worker()


def _main_hard_exit():
    """Run the worker, then HARD-exit: ordinary interpreter teardown
    aborts ("FATAL: exception not rethrown") when a daemon thread — the
    serve-lean background compile, or the tunnel client's own workers —
    is mid-C++-call as Python shuts down. Everything user-visible is
    flushed first; bench.py exits the same way for the same reason."""
    code = main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(code)


if __name__ == "__main__":
    _main_hard_exit()
