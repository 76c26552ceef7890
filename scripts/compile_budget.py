"""Cold-suite compile-cost audit: where the XLA compile time goes, per test
and per traced-function name.

Runs ``pytest tests/unit`` COLD (fresh persistent-cache dir) with a spy on
``jax._src.compiler.compile_or_get_cached`` that attributes every XLA
program to (traced-function name, test nodeid, compile seconds), then
prints the decomposition the cold-start budget discussion needs:

- total programs / compile seconds / suite wall,
- top traced-function names (jit_fn = beam/sample programs, jit_scan =
  eager layer-stack scans, jit__normal/_uniform = per-shape PRNG init, ...),
- top tests by compile cost,
- cost-band histogram (full compiles vs persistent-cache hits: a hit costs
  trace+lower+load, ~20-100 ms, and still reaches the spy).

Usage:  python scripts/compile_budget.py [--out COMPILE_BUDGET.md]

See COMPILE_BUDGET.md for the committed round-5 measurement and the
irreducibility analysis (what was tried and measured NOT to help).
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def cpu_calibration(seconds: float = 2.0) -> float:
    """Measured single-core matmul rate (GFLOP/s) right now.

    Shared-tenancy CPU speed swings by >15% between windows. NOTE
    (measured r5): BLAS rate does NOT track XLA compile speed — one window
    showed 45 GFLOP/s BLAS with 1.2x-slow compiles (LLVM is branch/cache
    bound, BLAS rides AVX turbo). Use ``compile_calibration`` as the
    yardstick for cold-suite walls; this stays as a general load probe."""
    import numpy as np

    n = 512
    a = np.random.default_rng(0).normal(size=(n, n))
    b = np.random.default_rng(1).normal(size=(n, n))
    flops_per = 2 * n**3
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < seconds:
        a @ b
        reps += 1
    dt = time.perf_counter() - t0
    return reps * flops_per / dt / 1e9


CALIBRATION_PROG = r'''
import os, time
os.environ["XLA_FLAGS"] = "--xla_backend_optimization_level=0"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

def make(i):
    def fn(x, w1, w2):
        def body(c, _):
            h = jnp.maximum(c @ w1, 0.0)
            c = jnp.tanh(h @ w2) * (1.0 + i) + c
            s = jax.nn.softmax(c, axis=-1)
            top, _ = jax.lax.top_k(s, 8)
            return c, top.sum(-1)
        out, sums = jax.lax.scan(body, x, None, length=12)
        return out.mean() + sums.sum()
    return fn

x = jnp.ones((64, 192)); w1 = jnp.ones((192, 384)); w2 = jnp.ones((384, 192))
t0 = time.perf_counter()
for i in range(8):
    jax.jit(make(i)).lower(x, w1, w2).compile()
print(f"{time.perf_counter() - t0:.3f}")
'''


def compile_calibration() -> float:
    """Seconds to compile one fixed mid-size XLA program in a fresh
    process (no persistent cache configured there) — the direct yardstick
    for comparing cold-suite walls across box windows."""
    proc = subprocess.run(
        [sys.executable, "-c", CALIBRATION_PROG],
        capture_output=True, text=True, timeout=300,
    )
    return float(proc.stdout.strip().splitlines()[-1])

PLUGIN = '''
import json, time
import jax._src.compiler as C
_real = C.compile_or_get_cached
OUT = open(r"%(log)s", "a")
CUR = {"t": "?"}
def pytest_runtest_setup(item):
    CUR["t"] = item.nodeid
def _wrap(backend, computation, *a, **k):
    t0 = time.perf_counter()
    out = _real(backend, computation, *a, **k)
    dt = time.perf_counter() - t0
    try:
        name = str(computation.operation.attributes["sym_name"]).strip('"')
    except Exception:
        name = "?"
    OUT.write(json.dumps({"name": name, "s": round(dt, 4),
                          "test": CUR["t"]}) + "\\n")
    return out
C.compile_or_get_cached = _wrap
'''


def run_cold(log_path: str) -> tuple[float, str]:
    """Run the unit suite with a fresh compile cache + the spy plugin.
    Returns (wall_seconds, pytest_tail)."""
    with tempfile.TemporaryDirectory() as td:
        plug_dir = os.path.join(td, "plug")
        os.makedirs(plug_dir)
        with open(os.path.join(plug_dir, "compile_spy_plugin.py"), "w") as f:
            f.write(PLUGIN % {"log": log_path})
        env = dict(os.environ)
        env["SONAR_TPU_TEST_CACHE_DIR"] = os.path.join(td, "cold_xla_cache")
        env["PYTHONPATH"] = plug_dir + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/unit", "-q",
             "-p", "compile_spy_plugin"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
        )
        wall = time.perf_counter() - t0
        tail = "\n".join(proc.stdout.strip().splitlines()[-2:])
        if proc.returncode != 0:
            print(proc.stdout[-4000:], file=sys.stderr)
            raise SystemExit(f"suite failed (rc={proc.returncode})")
        return wall, tail


def analyze(log_path: str, wall: float, tail: str,
            gflops: float | None = None,
            compile_ref_s: float | None = None) -> str:
    recs = [json.loads(l) for l in open(log_path)]
    total_s = sum(r["s"] for r in recs)
    lines = []
    w = lines.append
    w("# Cold-suite compile budget (measured)")
    w("")
    w(f"- suite: `{tail}`; subprocess wall {wall:.0f}s")
    if gflops is not None:
        w(f"- box speed at run time: {gflops:.2f} single-core GFLOP/s "
          f"(512^3 numpy matmul — load probe only; does NOT track compile "
          f"speed)")
    if compile_ref_s is not None:
        w(f"- compile yardstick: {compile_ref_s:.2f}s for the fixed "
          f"reference program (fresh process, no cache) — compare cold "
          f"walls across box windows via this ratio; same-code cold walls "
          f"varied 387-577 s across windows in r5")
    w(f"- XLA programs: {len(recs)}; total time in "
      f"`compile_or_get_cached`: {total_s:.1f}s")
    w("")
    w("## Cost bands (full compiles vs cache-hit floor)")
    w("")
    w("| band (s) | programs | total s | reading |")
    w("|---|---|---|---|")
    bands = [
        (0.0, 0.02, "in-run trivial"),
        (0.02, 0.1, "persistent-cache hits + tiny eager ops"),
        (0.1, 0.3, "PRNG/scan-class eager ops"),
        (0.3, 1.0, "per-config jitted programs"),
        (1.0, 99.0, "large test subjects (grads, train steps, beams)"),
    ]
    for lo, hi, label in bands:
        sel = [r for r in recs if lo <= r["s"] < hi]
        w(f"| [{lo},{hi}) | {len(sel)} | {sum(r['s'] for r in sel):.1f} "
          f"| {label} |")
    w("")
    w("## By traced-function name (top 20)")
    w("")
    w("| name | programs | total s |")
    w("|---|---|---|")
    byname: collections.Counter = collections.Counter()
    bytime: collections.Counter = collections.Counter()
    for r in recs:
        n = r["name"].split("$")[0]
        byname[n] += 1
        bytime[n] += r["s"]
    for n, t in sorted(bytime.items(), key=lambda x: -x[1])[:20]:
        w(f"| {n} | {byname[n]} | {t:.1f} |")
    w("")
    w("## By test (top 25)")
    w("")
    w("| compile s | programs | test |")
    w("|---|---|---|")
    bytest_t: collections.Counter = collections.Counter()
    bytest_n: collections.Counter = collections.Counter()
    for r in recs:
        bytest_t[r["test"]] += r["s"]
        bytest_n[r["test"]] += 1
    for t, s in sorted(bytest_t.items(), key=lambda x: -x[1])[:25]:
        w(f"| {s:.1f} | {bytest_n[t]} | {t.split('/')[-1]} |")
    w("")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="write the markdown table here (default: stdout)")
    args = ap.parse_args()
    with tempfile.NamedTemporaryFile(suffix=".jsonl", delete=False) as f:
        log_path = f.name
    g0 = cpu_calibration()
    c0 = compile_calibration()
    wall, tail = run_cold(log_path)
    c1 = compile_calibration()
    g1 = cpu_calibration()
    report = analyze(log_path, wall, tail, gflops=(g0 + g1) / 2,
                     compile_ref_s=(c0 + c1) / 2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
        print(f"wrote {args.out}")
    else:
        print(report)


if __name__ == "__main__":
    main()
