"""Subprocess driver for the examples smoke test (tests/examples/).

Runs EVERY examples/*.py in one process (one JAX import, shared jit/compile
caches — the toy archs overlap heavily across examples, so this is several
times cheaper than one subprocess each) on the CPU platform, and prints one
JSON line per example: {"name", "ok", "seconds", "error"}.

Invoked by tests/examples/test_examples_smoke.py; also runnable by hand:
    python tests/examples/example_runner.py [cache_dir]
"""

import io
import json
import os
import runpy
import sys
import time
import traceback

import jax

jax.config.update("jax_platforms", "cpu")
if len(sys.argv) > 1:
    jax.config.update("jax_compilation_cache_dir", sys.argv[1])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
EXAMPLES_DIR = os.path.join(REPO, "examples")
sys.path.insert(0, EXAMPLES_DIR)


def main() -> int:
    names = sorted(
        f[:-3] for f in os.listdir(EXAMPLES_DIR)
        if f.endswith(".py") and not f.startswith("_")
    )
    failures = 0
    for name in names:
        path = os.path.join(EXAMPLES_DIR, name + ".py")
        t0 = time.time()
        err = ""
        # Examples read sys.argv (optional paths/texts) and print results;
        # give each a clean argv and swallow its stdout so the only stdout
        # of this driver is the per-example JSON protocol.
        saved_argv, saved_stdout = sys.argv, sys.stdout
        sys.argv, sys.stdout = [path], io.StringIO()
        try:
            runpy.run_path(path, run_name="__main__")
            ok = True
        except BaseException:
            ok = False
            err = traceback.format_exc(limit=20)
        finally:
            sys.argv, sys.stdout = saved_argv, saved_stdout
        if not ok:
            failures += 1
        print(json.dumps({
            "name": name,
            "ok": ok,
            "seconds": round(time.time() - t0, 1),
            "error": err[-2000:],
        }), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
